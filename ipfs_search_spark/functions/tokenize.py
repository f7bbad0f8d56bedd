"""Tokenization — the engine's analyzer.

The reference's text fields use the OpenSearch `standard` analyzer (implied by
the mappings, /root/reference/docs/indices/files.json:91-139). Our canonical
analyzer is "standard-lite": lowercase, then maximal runs of [a-z0-9]. It is
expressible in three places with IDENTICAL results — Spark built-ins (JVM,
whole-stage-codegen), DuckDB SQL (the correctness oracle), and pure Python
(the BM25 rank-identity oracle) — which is what makes the oracle checks exact.

A language-aware pandas UDF adds a CJK branch (each Han codepoint is a token,
like Lucene's CJK handling) for the `lang` column the input_hint mandates;
latin langs share the canonical analyzer.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

TOKEN_SPLIT_RE = "[^a-z0-9]+"  # same dialect meaning in Java regex & RE2
_PY_TOKEN_RE = re.compile(r"[a-z0-9]+")
_CJK_RE = re.compile(r"[一-鿿]")
_CJK_SPLIT_RE = re.compile(r"[一-鿿]|[a-z0-9]+")


def tokenize_str(text: str, lang: str = "en") -> list[str]:
    """Pure-Python canonical tokenizer (the oracle's analyzer)."""
    if text is None:
        return []
    low = text.lower()
    if lang == "zh" and _CJK_RE.search(low):
        return _CJK_SPLIT_RE.findall(low)
    return _PY_TOKEN_RE.findall(low)


def tokens_array(text_col: Column) -> Column:
    """JVM-side canonical tokenizer: array<string> with empties removed."""
    return F.array_remove(F.split(F.lower(text_col), TOKEN_SPLIT_RE), "")


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
    """Language-aware analyzer over Arrow batches (CJK branch)."""
    return pd.Series(
        [tokenize_str(t, lg or "en") for t, lg in zip(text, lang)],
        dtype=object,
    )


def doc_tokens(df: DataFrame, doc_col: str = "doc_id", text_col: str = "text",
               lang_col: str | None = None,
               positions: bool = False,
               aggregate: bool = True) -> DataFrame:
    """pages/documents → one row per (doc, term) with tf and dl.

    Stays entirely in whole-stage codegen for latin corpora (split + explode +
    hash agg; no Python). When `lang_col` is given, the lang-aware pandas UDF
    handles the CJK branch. dl (BM25 document length) is counted BEFORE the
    groupBy so it rides along as a per-doc constant — no second pass over the
    text.

    positions=True adds a `positions: array<int>` column (ascending token
    indexes of the term within the doc) via posexplode — the positional
    index's input (the reference's `term_vector: with_positions_offsets`,
    /root/reference/docs/indices/files.json:93). Shuffle rows stay one per
    (doc, term); positions ride as a payload array.

    aggregate=False skips the tf groupBy and returns RAW token rows (one
    per occurrence, with a flat `pos` int when positions=True): the
    single-shuffle build path, where the (bucket, shard) encoder computes
    tf as a run length. Prefer aggregate=True when MATERIALIZING a tokens
    table (checkpointed builds — the stored table stays avg-tf× smaller)
    or when the corpus' average tf is high enough that the extra groupBy
    shuffle pays for itself; the direct build path uses aggregate=False.
    """
    if lang_col:
        arr = tokenize_udf(F.col(text_col), F.col(lang_col))
    else:
        arr = tokens_array(F.col(text_col))
    with_arr = df.select(F.col(doc_col).alias("doc_id"), arr.alias("_toks"))
    with_dl = with_arr.withColumn("dl", F.size("_toks")).filter(F.col("dl") > 0)
    if not aggregate:
        if positions:
            return with_dl.select(
                "doc_id", "dl", F.posexplode("_toks").alias("pos", "term"))
        return with_dl.select(
            "doc_id", "dl", F.explode("_toks").alias("term"))
    if positions:
        exploded = with_dl.select(
            "doc_id", "dl", F.posexplode("_toks").alias("pos", "term"))
        return exploded.groupBy("doc_id", "dl", "term").agg(
            F.count(F.lit(1)).cast("int").alias("tf"),
            F.sort_array(F.collect_list("pos")).alias("positions"),
        )
    exploded = with_dl.select("doc_id", "dl", F.explode("_toks").alias("term"))
    return exploded.groupBy("doc_id", "dl", "term").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )
