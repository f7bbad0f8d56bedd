"""Text-analysis columns for a training-data pipeline: quality scoring,
language-ID heuristic, token counting, document fingerprinting.

All pure Spark built-ins (whole-stage codegen) so they run at 100 TB without
Python on the hot path. Each returns Column expressions composable into any
select; __spark_entry__.py wires them into DuckDB-oracle-checked queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ipfs_search_spark.functions.tokenize import tokens_array

# tiny per-language marker lexicons for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "que", "de"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def token_count(text: Column) -> Column:
    """Whitespace+punct token count (the BM25 dl measure)."""
    return F.size(tokens_array(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword estimate: alnum runs + standalone punctuation marks,
    GPT-2-regex-lite. A cheap proxy for LLM token budgets at corpus scale."""
    arr = F.array_remove(
        F.split(F.lower(text), r"((?<=[a-z0-9])(?=[^a-z0-9\s]))|\s+"), "")
    return F.size(arr)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.when(F.length(text) > 0,
                  F.length(stripped).cast("double") / F.length(text)
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    toks = tokens_array(text)
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0,
                  n_sw.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    toks = tokens_array(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic (length / punctuation / stopword
    signals — the C4/Gopher-style cheap filters). Deterministic arithmetic
    only, so it is DuckDB-oracle-checkable bit-for-bit after rounding."""
    n = token_count(text)
    len_ok = F.least(n.cast("double") / F.lit(64.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    sw = stopword_ratio(text)
    sw_ok = F.when((sw >= 0.05) & (sw <= 0.6), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_ok * punct_pen * sw_ok, 6)


def lang_id(text: Column) -> Column:
    """Marker-lexicon language ID: argmax of marker-hit counts, 'und' when no
    marker hits. Ties break in fixed key order (en, de, fr, es)."""
    return lang_id_struct(text)["lang"]


def lang_id_struct(text: Column) -> Column:
    """Language detection with confidence — the reference's Language struct
    carries (Language, Confidence, RawScore) per doc
    (/root/reference/components/index/types/file.go:4-8, via the lingua
    detector). struct(lang, confidence): confidence = winning language's
    marker-hit share of all marker hits (0.0 for 'und'); deterministic
    arithmetic, DuckDB-mirrorable."""
    toks = tokens_array(text)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    total = F.lit(0)
    for code in ("es", "fr", "de", "en"):  # reversed so earlier keys win ties
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[code]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        take = hits >= F.greatest(best_hits, F.lit(1))
        best_lang = F.when(take, F.lit(code)).otherwise(best_lang)
        best_hits = F.when(take, hits).otherwise(best_hits)
        total = total + hits
    conf = F.when(best_lang == "und", F.lit(0.0)).otherwise(
        F.round(best_hits.cast("double") / total, 6))
    return F.struct(best_lang.alias("lang"), conf.alias("confidence"))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (the reference's fingerprint analyzer
    uses 5-shingles + min_hash — /root/reference/docs/indices/files.json:39-63)."""
    toks = tokens_array(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array())


def minhash_signature(text: Column, n_hashes: int = 8, shingle_n: int = 3
                      ) -> Column:
    """MinHash signature as array<string>: per seed i, min(md5(i||shingle)).
    md5-based so DuckDB computes the identical signature (cross-engine oracle;
    Spark xxhash64 has no DuckDB twin). Returns array of n_hashes hex strings."""
    sh = shingles(text, shingle_n)
    sig = []
    for i in range(n_hashes):
        hashed = F.transform(sh, lambda s: F.md5(F.concat(F.lit(str(i) + "|"), s)))
        sig.append(F.array_min(hashed))
    return F.array(*sig)


def doc_fingerprint(text: Column, shingle_n: int = 5) -> Column:
    """Single-value document fingerprint: min md5 over 5-shingles (winnowing-
    lite / the reference's fingerprint field). Stable under whitespace noise
    because shingling runs on analyzed tokens."""
    return F.array_min(
        F.transform(shingles(text, shingle_n), lambda s: F.md5(s)))
