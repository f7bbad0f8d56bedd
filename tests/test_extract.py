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


def test_metadata_title_extraction(spark, pages):
    """canonical_documents populates the metadata map: title == the first
    text line (fixtures render paragraph 0 into <title>), Content-Type
    constant; no metadata for pages that failed extraction."""
    from ipfs_search_spark.operators.index_build import canonical_documents
    docs = canonical_documents(pages, max_bytes=1 << 15).collect()
    n_titled = 0
    for r in docs:
        if r["status"] == "ok" and r["text"]:
            assert r["metadata"] is not None, r["url"]
            assert r["metadata"]["Content-Type"].startswith("text/html")
            exp_title = r["text"].split("\n", 1)[0]
            assert r["metadata"].get("title", "") == exp_title, r["url"]
            n_titled += 1
        elif r["status"] == "invalid_too_large":
            assert r["metadata"] is None
    assert n_titled > 500


def test_fielded_index_on_extracted_title(spark, pages, tmp_path):
    """End-to-end: real extracted <title> metadata feeds the fielded
    (title/content) index — the reference's metadata.title default_field."""
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.index_build import (
        build_fielded_index, canonical_documents,
    )
    from ipfs_search_spark.plans.query import Searcher
    docs = canonical_documents(pages, max_bytes=1 << 15).withColumn(
        "title", F.element_at("metadata", "title"))
    io = TableIO(spark, str(tmp_path / "meta-fielded"))
    build_fielded_index(spark, docs.filter("status = 'ok'"), io,
                        fields={"title": "title", "content": "text"},
                        n_shards=2, n_buckets=8)
    sx = Searcher(spark, io)
    out = sx.search([(0, "data")], k=5,
                    fields={"title": 2.0, "content": 1.0},
                    combine="max").collect()
    assert len(out) == 5
    assert out[0]["score"] > 0


def test_outlink_and_meta_extraction_golden():
    """urls / description / keywords / author extraction matches the
    fixture generators exactly (the outlink list is keyed by (idx, seed) so
    it is recomputable independently of html rendering)."""
    import math

    from ipfs_search_spark.fixtures import (
        _links_for_index, _meta_for_index, _vocab,
    )
    from ipfs_search_spark.functions.extract import (
        extract_meta_str, extract_urls_str,
    )
    n, seed = 400, 31
    rows = generate_pages(n=n, seed=seed)
    vocab = _vocab(max(64, int(20 * math.sqrt(n))))
    url_fmt = "https://example.org/{seed}/{idx:08d}.html"
    checked = 0
    for r in rows:
        if not r["text"]:
            continue
        idx = int(r["url"].rsplit("/", 1)[1].split(".")[0])
        html = r["html"].decode("utf-8", errors="replace")
        assert extract_urls_str(html) == _links_for_index(
            idx, seed, n, url_fmt=url_fmt), r["url"]
        assert extract_meta_str(html) == _meta_for_index(
            idx, seed, vocab), r["url"]
        checked += 1
    assert checked > 300


def test_outlink_edge_cases():
    from ipfs_search_spark.functions.extract import (
        extract_meta_str, extract_urls_str,
    )
    # entity unescape, quote styles, fragment/empty drop, dedupe, comments
    html = ('<a href="https://x.example/a?p=1&amp;q=2">t</a>'
            "<a href='https://y.example/b'>u</a>"
            '<a href=https://z.example/c>v</a>'
            '<a href="#frag">w</a><a href="">x</a>'
            '<a href="https://x.example/a?p=1&amp;q=2">again</a>'
            '<!-- <a href="https://hidden.example/"></a> -->')
    assert extract_urls_str(html) == [
        "https://x.example/a?p=1&q=2", "https://y.example/b",
        "https://z.example/c"]
    # meta attribute order + entity content; unknown names ignored
    html2 = ('<meta content="a &amp; b" name="description">'
             '<meta name="keywords" content="k1, k2">'
             '<meta name="viewport" content="width=device-width">'
             '<meta name="author" content="">')
    assert extract_meta_str(html2) == {
        "description": "a & b", "keywords": "k1, k2"}


def test_canonical_documents_urls_and_meta(spark, pages):
    """canonical_documents stores the harvested outlink array and the full
    metadata map (the reference's urls field + metadata island)."""
    from ipfs_search_spark.operators.index_build import canonical_documents
    docs = canonical_documents(pages, max_bytes=1 << 15).cache()
    ok = docs.filter(F.col("status") == "ok")
    assert ok.filter(F.size("urls") > 0).count() > 300
    assert ok.filter(
        F.element_at("metadata", "description").isNotNull()).count() > 300
    assert ok.filter(
        F.element_at("metadata", "author").isNotNull()).count() > 150
    docs.unpersist()


def test_title_inside_comment_or_script_ignored():
    from ipfs_search_spark.functions.extract import extract_title_str
    html = ("<!-- <title>Old draft</title> --><head>"
            "<script>var t = '<title>js</title>';</script>"
            "<title>Real title</title></head><body>x</body>")
    assert extract_title_str(html) == "Real title"
    assert extract_title_str("<!-- <title>only in comment</title> -->") == ""


def test_status_with_metadata_and_no_max_bytes(spark):
    from ipfs_search_spark.functions.extract import with_extracted_text
    df = spark.createDataFrame(
        [("a", bytearray(b"<title>T</title><p>hi</p>")),
         ("b", bytearray(b""))],
        "url string, html binary")
    out = with_extracted_text(df, status_col="status",
                              metadata_col="metadata").collect()
    by_url = {r["url"]: r for r in out}
    assert by_url["a"]["status"] == "ok"
    assert by_url["a"]["metadata"]["title"] == "T"
    assert by_url["b"]["status"] == "partial"
