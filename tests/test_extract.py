"""Extraction invariant: byte-identical text per url (north-rule invariant).

Mirrors the reference's Tika extraction contract
(/root/reference/components/extractor/tika/extractor.go:33-61) and size-cap
behavior (extractor/util.go:15-29)."""

import pyspark.sql.functions as F

from ipfs_search_spark.fixtures import generate_pages
from ipfs_search_spark.functions.extract import (
    extract_text_str, with_extracted_text,
)


def test_golden_roundtrip_pure_python():
    rows = generate_pages(n=800, seed=123)
    for r in rows:
        got = extract_text_str(r["html"].decode("utf-8", errors="replace"))
        assert got == r["text"], r["url"]


def test_entities_and_markup_edges():
    assert extract_text_str("<p>a&amp;b x&lt;y</p>") == "a&b x<y"
    assert extract_text_str("<script>var x=1;</script><p>hi</p>") == "hi"
    assert extract_text_str("<!-- c --><div> a  b </div>") == "a b"
    assert extract_text_str("w1 <b>w2 w3</b> w4") == "w1 w2 w3 w4"
    assert extract_text_str("<p>l1</p><p>l2</p>") == "l1\nl2"
    assert extract_text_str("") == ""
    assert extract_text_str("  \n\t ") == ""


def test_udf_matches_golden_and_classifies(spark, pages):
    out = with_extracted_text(
        pages.withColumnRenamed("text", "golden"),
        max_bytes=1 << 15, status_col="status",
    )
    mismatch = out.filter(
        (F.col("status") == "ok") & (F.col("text") != F.col("golden"))
    ).count()
    assert mismatch == 0
    stats = {r["status"]: r["n"] for r in
             out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert stats.get("ok", 0) > 0
    assert stats.get("invalid_too_large", 0) > 0  # oversize rows exist
    # oversize rows are NOT extracted (UDF short-circuited by the JVM filter)
    assert out.filter((F.col("status") == "invalid_too_large")
                      & F.col("text").isNotNull()).count() == 0
