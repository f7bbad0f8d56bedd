"""Analyzer parity: JVM split path == pandas UDF path == pure-Python oracle
tokenizer, plus the CJK branch."""

import pyspark.sql.functions as F

from ipfs_search_spark.functions.tokenize import (
    doc_tokens, tokenize_str, tokenize_udf, tokens_array,
)


def test_pure_python_tokenizer():
    assert tokenize_str("Hello, World! 42") == ["hello", "world", "42"]
    assert tokenize_str("a&b x<y it's") == ["a", "b", "x", "y", "it", "s"]
    assert tokenize_str("") == []
    assert tokenize_str(None) == []
    assert tokenize_str("café naïve") == ["caf", "na", "ve"]


def test_cjk_branch():
    assert tokenize_str("搜索 engine 引擎", lang="zh") == \
        ["搜", "索", "engine", "引", "擎"]
    # non-CJK text under lang=zh falls back to the canonical analyzer
    assert tokenize_str("plain text", lang="zh") == ["plain", "text"]


def test_jvm_vs_udf_vs_python_parity(spark, pages):
    df = pages.select("url", "text", "lang").limit(200)
    out = df.select(
        "url", "text", "lang",
        tokens_array(F.col("text")).alias("jvm"),
        tokenize_udf(F.col("text"), F.col("lang")).alias("udf"),
    ).collect()
    for r in out:
        py = tokenize_str(r["text"], r["lang"])
        assert list(r["jvm"]) == tokenize_str(r["text"], "en"), r["url"]
        assert list(r["udf"]) == py, r["url"]


def test_doc_tokens_tf_dl(spark):
    df = spark.createDataFrame(
        [(1, "a b a c a b"), (2, ""), (3, "x x x")], "doc_id long, text string")
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["dl"])
            for r in doc_tokens(df).collect()}
    assert rows[(1, "a")] == (3, 6)
    assert rows[(1, "b")] == (2, 6)
    assert rows[(1, "c")] == (1, 6)
    assert rows[(3, "x")] == (3, 3)
    assert not any(d == 2 for d, _ in rows)  # empty doc dropped
