"""Dedup family + ANN similarity: recall on planted near-duplicates, LSH vs
brute-force agreement."""

import pyspark.sql.functions as F
import pytest

from ipfs_search_spark.operators.dedup import (
    exact_dedup, minhash_lsh_pairs, ngram_jaccard_verify, simhash_dedup,
)
from ipfs_search_spark.operators.similarity import (
    add_lsh_buckets, brute_force_topk, cosine_neardup_pairs, lsh_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 base docs + near-dup copies of the first 10 (one word changed) +
    exact dups of 5."""
    import random
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(60):
        words = [vocab[rng.randrange(50)] for _ in range(40)]
        rows.append((i, " ".join(words)))
    for i in range(10):  # near-dups
        words = rows[i][1].split()
        words[3] = "changed"
        rows.append((1000 + i, " ".join(words)))
    for i in range(5):  # exact dups
        rows.append((2000 + i, rows[i][1]))
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_dedup(spark, corpus):
    out = exact_dedup(corpus, "id", "text")
    dups = out.filter(~F.col("is_keeper")).collect()
    assert {r["id"] for r in dups} == {2000 + i for i in range(5)}
    assert all(r["keeper_id"] == r["id"] - 2000 for r in dups)


def test_minhash_lsh_recall(spark, corpus):
    pairs = minhash_lsh_pairs(corpus, "id", "text", n_hashes=8, bands=4)
    verified = ngram_jaccard_verify(corpus, pairs, "id", "text",
                                    threshold=0.6)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    # every planted near-dup pair must be found (LSH recall on 0.9-jaccard
    # pairs with 4 bands x 2 rows is ~1-(1-.9^2)^4 ≈ 0.999 per band set;
    # exact dups always collide)
    for i in range(5):
        assert (i, 2000 + i) in got
    found_near = sum((i, 1000 + i) in got for i in range(10))
    assert found_near >= 8


def test_lsh_bucket_cap_bounds_megacluster(spark):
    """A planted boilerplate cluster (m identical pages — the web-scale skew
    case) must NOT produce m²/2 candidate pairs: max_bucket drops the
    oversized band buckets, pairs outside the cluster are still found, and
    the dropped buckets are reported (no silent truncation)."""
    from ipfs_search_spark.operators.dedup import lsh_dropped_buckets
    rows = [(i, "boiler plate page body text repeated " * 4)
            for i in range(2000)]
    rows += [(100000, "unique alpha beta gamma delta words " * 4),
             (100001, "unique alpha beta gamma delta words " * 4)]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = minhash_lsh_pairs(df, "id", "text", max_bucket=100)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (100000, 100001) in got
    assert all(a >= 100000 for a, _ in got)  # cluster pairs all dropped
    dropped = lsh_dropped_buckets(df, "id", "text", max_bucket=100).collect()
    assert dropped and all(r["n_docs"] == 2000 for r in dropped)


def test_simhash_neardup(spark, corpus):
    pairs = simhash_dedup(corpus, "id", "text", max_hamming=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(5):  # exact dups: hamming 0
        assert (i, 2000 + i) in got
    hams = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_dedup(corpus, "id", "text", 64).collect()}
    assert all(h == 0 for (a, b), h in hams.items() if b == a + 2000)


def test_simhash_md5_neardup(spark, corpus):
    """The JVM/md5 simhash variant (oracle-parity path) finds the same
    planted duplicates: exact dups at hamming 0, near-dups at low hamming."""
    from ipfs_search_spark.operators.dedup import simhash_md5_dedup
    pairs = simhash_md5_dedup(corpus, "id", "text", max_hamming=10)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    for i in range(5):
        assert got.get((i, 2000 + i)) == 0
    found_near = sum((i, 1000 + i) in got for i in range(10))
    assert found_near >= 8


def test_simhash_bucket_cap_bounds_megacluster(spark):
    """A planted cluster of identical pages must not yield m²/2 simhash
    candidate pairs: max_bucket drops the oversized (band, band_val)
    buckets (all 4 for identical signatures), pairs outside the cluster
    survive, and the audit view reports what was dropped."""
    from ipfs_search_spark.operators.dedup import (
        simhash_dropped_buckets, simhash_md5_bands, simhash_md5_dedup,
    )
    rows = [(i, "boiler plate page body text repeated " * 4)
            for i in range(2000)]
    rows += [(100000, "unique alpha beta gamma delta words " * 4),
             (100001, "unique alpha beta gamma delta words " * 4)]
    df = spark.createDataFrame(rows, "id long, text string")
    bands = simhash_md5_bands(df, "id", "text")
    pairs = simhash_md5_dedup(df, "id", "text", max_hamming=3,
                              max_bucket=100, bands_df=bands)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (100000, 100001) in got
    assert all(a >= 100000 for a, _ in got)  # cluster pairs all dropped
    dropped = simhash_dropped_buckets(bands, max_bucket=100).collect()
    assert dropped and all(r["n_docs"] >= 2000 for r in dropped)
    # the FNV/Arrow variant honors the same cap
    from ipfs_search_spark.operators.dedup import simhash_dedup
    got_fnv = {(r["id_a"], r["id_b"])
               for r in simhash_dedup(df, "id", "text", max_hamming=3,
                                      max_bucket=100).collect()}
    assert (100000, 100001) in got_fnv
    assert all(a >= 100000 for a, _ in got_fnv)


def test_fingerprint_lookup_trio(spark, corpus):
    """The more-like-this surface end to end: query_band_keys (the
    driver-side hashlib mirror) must reproduce the Spark-side band keys of
    a doc's own text, and the band-probe must surface planted duplicates."""
    from collections import defaultdict

    from ipfs_search_spark.operators.dedup import (
        minhash_bands, more_like_this, query_band_keys,
    )
    texts = {r["id"]: r["text"] for r in corpus.collect()}
    bands = minhash_bands(corpus, "id", "text")
    by_id = defaultdict(set)
    for r in bands.collect():
        by_id[r["id"]].add(r["band_key"])
    # driver/executor hash-chain parity on a doc's own text (the component
    # the r2 verdict flagged: query_band_keys reimplements the md5 chain)
    for probe in (0, 3, 17):
        assert set(query_band_keys(texts[probe])) == by_id[probe]
    # self-lookup through the real operator: the doc itself and its exact
    # dup share all 4 bands
    out = {r["id"]: r["n_shared_bands"]
           for r in more_like_this(bands, "id", texts[2]).collect()}
    assert out.get(2) == 4 and out.get(2002) == 4
    # near-dups (one word changed) collide on >=1 band for most of the 10
    found = sum(bool(by_id[1000 + i] & set(query_band_keys(texts[i])))
                for i in range(10))
    assert found >= 8


@pytest.fixture(scope="module")
def vectors(spark):
    import math
    import random
    rng = random.Random(11)
    rows = []
    for i in range(300):
        v = [rng.gauss(0, 1) for _ in range(16)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v], i % 5))
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_self_is_best(spark, vectors):
    q = [float(x) for x in
         vectors.filter("vec_id = 7").collect()[0]["embedding"]]
    top = brute_force_topk(vectors, q, k=5).collect()
    assert top[0]["vec_id"] == 7
    assert abs(top[0]["cosine"] - 1.0) < 1e-5
    assert all(top[i]["cosine"] >= top[i + 1]["cosine"] for i in range(4))


def test_lsh_topk_recall(spark, vectors):
    dim = 16
    bucketed = add_lsh_buckets(vectors, dim, n_planes=6).cache()
    n_buckets = bucketed.select("lsh_bucket").distinct().count()
    assert n_buckets > 8  # buckets actually spread
    hits = 0
    for qid in [3, 50, 120]:
        q = [float(x) for x in
             vectors.filter(f"vec_id = {qid}").collect()[0]["embedding"]]
        brute = [r["vec_id"] for r in brute_force_topk(vectors, q, 5).collect()]
        approx = [r["vec_id"] for r in
                  lsh_topk(bucketed, q, 5, dim=dim, n_planes=6,
                           n_probe_hamming=2).collect()]
        hits += len(set(brute) & set(approx))
    assert hits >= 9  # ≥60% recall@5 with 2-probe on random gaussians


def test_cosine_neardup_blocked(spark, vectors):
    # plant a duplicate vector in the same label block
    dup = vectors.filter("vec_id = 0").select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label")
    df = vectors.unionByName(dup)
    pairs = cosine_neardup_pairs(df, "label", threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 9000) in got


def test_ivf_topk_recall_and_determinism(spark, vectors):
    from ipfs_search_spark.operators.similarity import (
        add_ivf_cells, ivf_topk, train_ivf_centroids,
    )
    c1 = train_ivf_centroids(vectors, n_centroids=8, sample=256, iters=8)
    c2 = train_ivf_centroids(vectors, n_centroids=8, sample=256, iters=8)
    assert c1 == c2  # deterministic training (seeded hash-ordered sample)
    cells = add_ivf_cells(vectors, c1).cache()
    spread = cells.select("ivf_cell").distinct().count()
    assert spread >= 6  # the quantizer actually partitions the space
    hits = 0
    for qid in [3, 50, 120]:
        q = [float(x) for x in
             vectors.filter(f"vec_id = {qid}").collect()[0]["embedding"]]
        brute = [r["vec_id"] for r in brute_force_topk(vectors, q, 5).collect()]
        approx = [r["vec_id"] for r in
                  ivf_topk(cells, c1, q, k=5, n_probe=3).collect()]
        hits += len(set(brute) & set(approx))
    assert hits >= 9  # ≥60% recall@5 probing 3/8 cells
    # n_probe = n_centroids degenerates to exact search
    for qid in [3, 120]:
        q = [float(x) for x in
             vectors.filter(f"vec_id = {qid}").collect()[0]["embedding"]]
        brute = [r["vec_id"] for r in brute_force_topk(vectors, q, 5).collect()]
        full = [r["vec_id"] for r in
                ivf_topk(cells, c1, q, k=5, n_probe=8).collect()]
        assert brute == full


def test_mlt_through_search_surface(spark, corpus, tmp_path):
    """fingerprint_field + more_like_this_query wire near-dup lookup into
    the ORDINARY search() surface (the reference's `fingerprint`
    default_field is part of the same query_string): an index whose text
    is each doc's band keys, probed with a plain BM25 query of the
    driver-computed band keys — the doc itself is the top self-match and
    its planted dups outrank unrelated docs."""
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.dedup import fingerprint_field
    from ipfs_search_spark.operators.index_build import build_index_from_docs
    from ipfs_search_spark.plans.query import (
        Searcher, more_like_this_query,
    )

    texts = {r["id"]: r["text"] for r in corpus.collect()}
    docs = fingerprint_field(corpus, "id").select(
        F.col("id").cast("string").alias("url"),
        F.col("id").cast("long").alias("doc_id"),
        F.col("fingerprint").alias("text"),
        F.lit("en").alias("lang"), F.lit("ok").alias("status"))
    io = TableIO(spark, str(tmp_path / "mlt-ix"))
    build_index_from_docs(spark, docs, io, n_shards=2, n_buckets=8)
    sx = Searcher(spark, io)

    # probe doc 2 (has the exact dup 2002): self + exact dup share ALL
    # bands, so they take ranks 1-2 (tie broken by doc_id)
    rows = sx.search([(0, more_like_this_query(texts[2]))], k=5).collect()
    got = [(r["rank"], r["doc_id"]) for r in rows]
    assert got[0] == (1, 2) and got[1] == (2, 2002)

    # probe doc 0's near-dup text: doc 0 must surface among the hits
    hits = {r["doc_id"]: r["rank"] for r in
            sx.search([(0, more_like_this_query(texts[1000]))],
                      k=10).collect()}
    assert 1000 in hits and 0 in hits
