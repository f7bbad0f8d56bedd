"""Deduplication family for large-scale training-data pipelines.

Five strategies, all shuffle-conscious:
- exact:        hash-groupBy on a content digest (one shuffle on the digest)
- minhash LSH:  shingle → minhash → band → bucket-join (near-dup candidates
                meet only inside a band bucket — no all-pairs join)
- simhash:      64-bit simhash + hamming-ball candidate pairs via band tables
- ngram jaccard: exact verify step for candidate pairs
- embedding:    cosine near-dup within LSH buckets (see similarity.py)

The reference's analogue is the per-document fingerprint analyzer
(5-shingles + min_hash, /root/reference/docs/indices/files.json:39-63) —
OpenSearch stores the sketch; the LSH-join materialization is ours.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ipfs_search_spark.functions.textstats import minhash_signature, shingles


def _minhash_signatures(df: DataFrame, key: str, text_col: str,
                        n_hashes: int, shingle_n: int) -> DataFrame:
    """(_id, _h0.._h{n-1}) minhash signature table: one explode pass over
    shingle rows, ceil(n_hashes/4) chained md5s per shingle (each md5 = 32
    hex chars = 4 independent 32-bit slots compared as hex substrings),
    map-side-combinable min aggs."""
    n_chains = (n_hashes + 3) // 4
    sh = df.select(F.col(key).alias("_id"),
                   F.explode(shingles(F.col(text_col), shingle_n)).alias("_sh"))
    hh = F.concat(*[F.md5(F.concat(F.lit(f"{c}|"), F.col("_sh")))
                    for c in range(n_chains)])
    return sh.select("_id", hh.alias("_hh")).groupBy("_id").agg(*[
        F.min(F.substring("_hh", 8 * i + 1, 8)).alias(f"_h{i}")
        for i in range(n_hashes)
    ])


def _band_key_cols(n_hashes: int, bands: int) -> list:
    rows_per_band = n_hashes // bands
    return [
        F.md5(F.concat_ws("|", F.lit(str(b)),
                          *[F.col(f"_h{b * rows_per_band + i}")
                            for i in range(rows_per_band)])).alias("band_key")
        for b in range(bands)
    ]


def exact_dedup(df: DataFrame, key: str, text_col: str = "text",
                normalize: bool = True) -> DataFrame:
    """Exact dedup on a content digest; keeper = min key per digest.
    Adds (digest, keeper_id, dup_count, is_keeper). One shuffle on digest;
    at 100 TB the digest groupBy is the canonical map-side-combinable agg."""
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    with_h = df.withColumn("digest", F.md5(t))
    w = Window.partitionBy("digest")
    return (with_h
            .withColumn("keeper_id", F.min(key).over(w))
            .withColumn("dup_count", F.count(F.lit(1)).over(w))
            .withColumn("is_keeper", F.col(key) == F.col("keeper_id")))


def minhash_signatures(df: DataFrame, key: str, text_col: str = "text",
                       n_hashes: int = 8, bands: int = 4,
                       shingle_n: int = 3) -> DataFrame:
    """Public form of the signature pass — compute ONCE and pass the result
    to both minhash_lsh_pairs and lsh_dropped_buckets via `signatures=` so a
    pipeline running pairs+audit (the recommended shape) pays the expensive
    shingle-explode+hash scan a single time."""
    return _minhash_signatures(df, key, text_col, n_hashes, shingle_n)


def minhash_lsh_pairs(df: DataFrame, key: str, text_col: str = "text",
                      n_hashes: int = 8, bands: int = 4,
                      shingle_n: int = 3,
                      max_bucket: int | None = None,
                      signatures: DataFrame | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    signature(n_hashes) split into `bands` bands of n_hashes/bands rows each;
    docs sharing any band collide. Returns (id_a, id_b, band_hits) with
    id_a < id_b. Shuffle cost: one explode to (band_id, band_key) + one
    self-join per bucket — bounded by bucket sizes, never all-pairs.

    max_bucket: band buckets holding more than this many docs are DROPPED
    before the self-join. Web corpora contain million-page boilerplate
    clusters; one such bucket alone yields m²/2 candidate pairs in a single
    task — the data-dependent quadratic that kills banded LSH at scale. The
    cap bounds every bucket's pair count at max_bucket²/2; true near-dup
    pairs inside a dropped mega-cluster should be handled by the exact-dedup
    pre-pass (exact_dedup), which collapses identical pages for free. The
    guard costs one map-side-combinable count on band_key — the same key the
    protected self-join shuffles on.

    Hash budget: each shingle row pays ceil(n_hashes/4) md5 evaluations (one
    md5 = 32 hex chars = 4 independent 32-bit slot hashes compared as hex
    substrings), not one md5 PER SLOT — 4x less hashing on the hot explode.
    """
    # One explode pass: shingle rows → chained md5s → map-side-combinable
    # min aggs. (A nested-array formulation re-evaluates the shingle
    # expression once per signature slot under Catalyst projection collapse —
    # O(n_hashes×bands) recomputation; the explode+groupBy shape computes
    # each shingle hash exactly once and scales to any corpus.)
    sig = (signatures if signatures is not None
           else _minhash_signatures(df, key, text_col, n_hashes, shingle_n))
    exploded = sig.select(
        "_id",
        F.explode(F.array(*_band_key_cols(n_hashes, bands))).alias("band_key"))
    if max_bucket is not None:
        keep = (exploded.groupBy("band_key")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") <= max_bucket)
                .select("band_key"))
        exploded = exploded.join(keep, "band_key", "left_semi")
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (a.join(b, "band_key")
             .filter(F.col("a._id") < F.col("b._id"))
             .groupBy(F.col("a._id").alias("id_a"),
                      F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("band_hits")))
    return pairs


def lsh_dropped_buckets(df: DataFrame, key: str, text_col: str = "text",
                        n_hashes: int = 8, bands: int = 4,
                        shingle_n: int = 3,
                        max_bucket: int = 10_000,
                        signatures: DataFrame | None = None) -> DataFrame:
    """Audit view of what minhash_lsh_pairs' max_bucket guard drops:
    (band_key, n_docs) for every oversized bucket — no silent truncation;
    pipelines log/export this alongside the pair output. Pass the
    minhash_signatures() result as `signatures` to share the shingle-explode
    pass with the pairs job instead of recomputing it."""
    sig = (signatures if signatures is not None
           else _minhash_signatures(df, key, text_col, n_hashes, shingle_n))
    return (sig.select(
        "_id",
        F.explode(F.array(*_band_key_cols(n_hashes, bands))).alias("band_key"))
        .groupBy("band_key").agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket))


def minhash_bands(df: DataFrame, key: str, text_col: str = "text",
                  n_hashes: int = 8, bands: int = 4,
                  shingle_n: int = 3) -> DataFrame:
    """(key, band_key) fingerprint lookup table — the query-time near-dup
    surface of the reference's `fingerprint` default_field (5-shingle +
    min_hash analyzer, /root/reference/docs/indices/files.json:39-63; a
    search with fingerprint matching finds near-duplicates of the query
    text). At 100 TB this table is written partitioned/bucketed by band_key
    so a more-like-this probe reads only the probed buckets."""
    sig = _minhash_signatures(df, key, text_col, n_hashes, shingle_n)
    return sig.select(
        F.col("_id").alias(key),
        F.explode(F.array(*_band_key_cols(n_hashes, bands))).alias("band_key"))


def fingerprint_field(df: DataFrame, key: str, text_col: str = "text",
                      n_hashes: int = 8, bands: int = 4,
                      shingle_n: int = 3) -> DataFrame:
    """(key, fingerprint) — each doc's minhash band keys joined as a
    space-separated token string, for INDEXING as an ordinary (or fielded)
    search field. Band keys are lowercase hex, so the canonical analyzer
    keeps them intact: an index built over this column makes
    more-like-this reachable from the plain `search()` surface — BM25 over
    shared band keys, rarer bands weighing more — which is exactly the
    reference's `fingerprint` default_field (the 5-shingle + min_hash
    analyzer field searched by the same query_string,
    /root/reference/docs/indices/files.json:36,39-63). Query side:
    plans/query.more_like_this_query(text)."""
    b = minhash_bands(df, key, text_col, n_hashes, bands, shingle_n)
    return b.groupBy(key).agg(
        F.array_join(F.array_sort(F.collect_set("band_key")), " ")
        .alias("fingerprint"))


def query_band_keys(text: str, n_hashes: int = 8, bands: int = 4,
                    shingle_n: int = 3) -> list[str]:
    """Driver-side mirror of the banded-minhash chain for ONE query string
    (pure hashlib — no Spark job): the band keys a more-like-this probe
    filters on. Bit-identical to _minhash_signatures/_band_key_cols."""
    from ipfs_search_spark.functions.tokenize import tokenize_str
    toks = tokenize_str(text, "en")
    shs = [" ".join(toks[i:i + shingle_n])
           for i in range(len(toks) - shingle_n + 1)]
    if not shs:
        return []
    n_chains = (n_hashes + 3) // 4
    hhs = ["".join(hashlib.md5(f"{c}|{s}".encode()).hexdigest()
                   for c in range(n_chains)) for s in shs]
    slots = [min(h[8 * i:8 * i + 8] for h in hhs) for i in range(n_hashes)]
    rpb = n_hashes // bands
    return [hashlib.md5("|".join([str(b)] + slots[b * rpb:(b + 1) * rpb])
                        .encode()).hexdigest() for b in range(bands)]


def more_like_this(bands_df: DataFrame, key: str, text: str,
                   n_hashes: int = 8, bands: int = 4,
                   shingle_n: int = 3) -> DataFrame:
    """Fingerprint near-dup lookup at query time: docs sharing ≥1 minhash
    band with the query text, with the shared-band count as the similarity
    proxy (n_shared/bands estimates jaccard band agreement). The filter is
    a tiny IN-list over the band_key partition column — partition-pruned
    I/O at scale, never a scan."""
    keys = query_band_keys(text, n_hashes, bands, shingle_n)
    if not keys:
        return (bands_df.filter(F.lit(False))
                .groupBy(key).agg(F.count(F.lit(1)).alias("n_shared_bands")))
    return (bands_df.filter(F.col("band_key").isin(keys))
            .groupBy(key).agg(F.count(F.lit(1)).alias("n_shared_bands")))


def ngram_jaccard_verify(df: DataFrame, pairs: DataFrame, key: str,
                         text_col: str = "text", shingle_n: int = 3,
                         threshold: float = 0.7) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs (the verify step after LSH).

    Relational form: distinct shingle rows join the pair list on (id, shingle)
    — intersection is a count, union is |A|+|B|−∩. No array columns ship
    through the shuffle, everything stays in whole-stage codegen, and the
    intersect work is proportional to matches, not |A|×|B|."""
    sh = df.select(
        F.col(key).alias("_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n)))
        .alias("_sh"))
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    inter = (pairs.select("id_a", "id_b")
             .join(sh.select(F.col("_id").alias("id_a"), "_sh"), "id_a")
             .join(sh.select(F.col("_id").alias("id_b"), "_sh"),
                   ["id_b", "_sh"])
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("_inter")))
    j = (pairs.join(inter, ["id_a", "id_b"], "left")
         .na.fill({"_inter": 0})
         .join(sizes.select(F.col("_id").alias("id_a"),
                            F.col("_sz").alias("_sza")), "id_a")
         .join(sizes.select(F.col("_id").alias("id_b"),
                            F.col("_sz").alias("_szb")), "id_b"))
    union = F.col("_sza") + F.col("_szb") - F.col("_inter")
    jac = F.when(union > 0,
                 F.col("_inter").cast("double") / union).otherwise(F.lit(0.0))
    return (j.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


@pandas_udf(LongType())
def _simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token lists — Arrow-batched numpy, no per-row
    Python hashing: tokens are hashed via a vectorized FNV-1a over fixed-width
    byte views."""
    import numpy as np

    def fnv1a_batch(strs: list[str]) -> np.ndarray:
        h = np.full(len(strs), 0xCBF29CE484222325, dtype=np.uint64)
        if not strs:
            return h
        bufs = [s.encode("utf-8")[:16].ljust(16, b"\0") for s in strs]
        mat = np.frombuffer(b"".join(bufs), dtype=np.uint8).reshape(-1, 16)
        for j in range(16):
            h = (h ^ mat[:, j].astype(np.uint64)) * np.uint64(0x100000001B3)
        return h

    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            continue
        hs = fnv1a_batch(list(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.int64((v > 0).astype(np.uint64) @ (1 << np.arange(64, dtype=np.uint64)))
    return pd.Series(out)


def _cap_simhash_buckets(bands: DataFrame,
                         max_bucket: int | None) -> DataFrame:
    """Drop (band, band_val) buckets holding more than max_bucket docs
    BEFORE the self-join — the same boilerplate-mega-cluster guard as
    minhash_lsh_pairs' max_bucket (a 16-bit band bucket full of
    near-identical pages is an m²/2 quadratic in one task otherwise). The
    count agg is map-side combinable on the join's own shuffle key. Docs in
    a dropped bucket can still pair through their other 3 bands; identical
    pages belong to the exact-dedup pre-pass."""
    if max_bucket is None:
        return bands
    keep = (bands.groupBy("band", "band_val")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") <= max_bucket)
            .select("band", "band_val"))
    return bands.join(keep, ["band", "band_val"], "left_semi")


def simhash_dropped_buckets(bands: DataFrame,
                            max_bucket: int) -> DataFrame:
    """Audit view for the simhash band cap: (band, band_val, n_docs) for
    every bucket the cap drops — no silent truncation. Takes the bands
    DataFrame from simhash_md5_bands / the FNV variant so the signature
    pass is computed once and shared with the pair job."""
    return (bands.groupBy("band", "band_val")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") > max_bucket))


def simhash_md5_dedup(df: DataFrame, key: str, text_col: str = "text",
                      max_hamming: int = 3,
                      max_bucket: int | None = None,
                      bands_df: DataFrame | None = None) -> DataFrame:
    """SimHash near-dup pairs whose 64-bit token hash is the first 16 hex
    digits of md5(token) — chosen so an ANSI-SQL engine can mirror the
    signature bit-for-bit (the driver's DuckDB oracle). Fully JVM-side:
    md5 + conv + bit ops all stay in whole-stage codegen; the only shuffles
    are the per-doc signature groupBy and the band self-join, exactly like
    simhash_dedup (the Arrow/FNV variant kept for wider-than-16-byte token
    coverage).

    Signature: bit j (0..63) of the token hash is bit (j%4) of hex digit
    (j//4) of md5(token)[:16]; per doc v_j = Σ_occurrences (2·bit_j − 1),
    signature bit j = (v_j > 0). Stored as two 32-bit halves (sig_lo bits
    0..31, sig_hi bits 32..63) so no signed-64 overflow handling is needed
    on either engine; hamming = popcount(xor) summed over halves.

    max_bucket drops oversized (band, band_val) buckets before the
    self-join (see _cap_simhash_buckets); pass the simhash_md5_bands()
    result as `bands_df` to share the signature pass with
    simhash_dropped_buckets."""
    bands = (bands_df if bands_df is not None
             else simhash_md5_bands(df, key, text_col))
    bands = _cap_simhash_buckets(bands, max_bucket)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, ["band", "band_val"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.col("a.sig_lo").alias("lo_a"),
                    F.col("a.sig_hi").alias("hi_a"),
                    F.col("b.sig_lo").alias("lo_b"),
                    F.col("b.sig_hi").alias("hi_b"))
            .dropDuplicates(["id_a", "id_b"]))
    hamming = (F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))) +
               F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))))
    return (cand.withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def simhash_md5_bands(df: DataFrame, key: str,
                      text_col: str = "text") -> DataFrame:
    """(_id, sig_lo, sig_hi, band, band_val) 16-bit band table for the
    md5-variant simhash — the shared input of simhash_md5_dedup and
    simhash_dropped_buckets."""
    from ipfs_search_spark.functions.tokenize import tokens_array
    toks = df.select(F.col(key).alias("_id"),
                     F.explode(tokens_array(F.col(text_col))).alias("_t"))
    h = F.md5(F.col("_t"))
    dt = toks.select("_id", *[
        F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int").alias(f"_d{i}")
        for i in range(16)])
    aggs = []
    for j in range(64):
        bit = F.shiftright(F.col(f"_d{j // 4}"), j % 4).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"_v{j}"))
    v = dt.groupBy("_id").agg(*aggs)

    def half(lo_bit):
        expr = F.lit(0)
        for j in range(lo_bit, lo_bit + 32):
            expr = expr + F.when(F.col(f"_v{j}") > 0,
                                 F.lit(1 << (j - lo_bit))).otherwise(F.lit(0))
        return expr.cast("long")

    sig = v.select("_id", half(0).alias("sig_lo"), half(32).alias("sig_hi"))
    band_cols = [
        F.struct(F.lit(0).alias("band"),
                 F.col("sig_lo").bitwiseAND(F.lit(0xFFFF)).alias("band_val")),
        F.struct(F.lit(1).alias("band"),
                 F.shiftright("sig_lo", 16).bitwiseAND(F.lit(0xFFFF))
                 .alias("band_val")),
        F.struct(F.lit(2).alias("band"),
                 F.col("sig_hi").bitwiseAND(F.lit(0xFFFF)).alias("band_val")),
        F.struct(F.lit(3).alias("band"),
                 F.shiftright("sig_hi", 16).bitwiseAND(F.lit(0xFFFF))
                 .alias("band_val")),
    ]
    return sig.select("_id", "sig_lo", "sig_hi",
                      F.explode(F.array(*band_cols)).alias("bk")) \
              .select("_id", "sig_lo", "sig_hi", "bk.band", "bk.band_val")


def simhash_dedup(df: DataFrame, key: str, text_col: str = "text",
                  max_hamming: int = 3,
                  max_bucket: int | None = None) -> DataFrame:
    """SimHash near-dup candidate pairs: 64-bit simhash split into 4 16-bit
    bands; pairs sharing a band are verified by exact hamming distance
    (pigeonhole: any pair with distance ≤3 shares ≥1 of 4 bands). All JVM
    bit-ops after the Arrow-batched simhash. max_bucket caps band buckets
    (see _cap_simhash_buckets)."""
    from ipfs_search_spark.functions.tokenize import tokens_array
    sh = df.select(F.col(key).alias("_id"),
                   _simhash64(tokens_array(F.col(text_col))).alias("simhash"))
    bands = sh.select(
        "_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                     .alias("band_val"))
            for i in range(4)
        ])).alias("bk"),
    ).select("_id", "simhash", "bk.band", "bk.band_val")
    bands = _cap_simhash_buckets(bands, max_bucket)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, ["band", "band_val"])
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                    F.col("a.simhash").alias("sh_a"), F.col("b.simhash").alias("sh_b"))
            .dropDuplicates(["id_a", "id_b"]))
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
