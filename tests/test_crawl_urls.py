"""Crawl fixpoint (queue-recursion analogue), URL scalar helpers, NSFW gate."""

import pyspark.sql.functions as F

from ipfs_search_spark.functions.urls import gateway_url, resource_uri
from ipfs_search_spark.operators.crawl import crawl_fixpoint
from ipfs_search_spark.operators.multimodal import (
    classify_nsfw_stub, mime_gate,
)


def test_crawl_fixpoint_reaches_and_terminates(spark):
    # r -> a -> b -> c ; a -> b (diamond) ; d unreachable ; cycle b -> a
    links = spark.createDataFrame(
        [("r", "a", "na"), ("a", "b", "nb"), ("b", "c", "nc"),
         ("b", "a", "back"), ("x", "d", "nd")],
        "parent_url string, child_url string, name string")
    roots = spark.createDataFrame([("r",)], "url string")
    out = {r["url"]: r["depth"] for r in
           crawl_fixpoint(roots, links, max_depth=10).collect()}
    assert out == {"r": 0, "a": 1, "b": 2, "c": 3}  # cycle/unreachable ok


def test_crawl_fixpoint_depth_bound(spark):
    links = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}", "x") for i in range(10)],
        "parent_url string, child_url string, name string")
    roots = spark.createDataFrame([("n0",)], "url string")
    out = crawl_fixpoint(roots, links, max_depth=3).collect()
    assert {r["url"] for r in out} == {"n0", "n1", "n2", "n3"}


def test_resource_uri_and_gateway_url(spark):
    df = spark.createDataFrame(
        [("ipfs", "Qm1", "QmP", "file name.epub"),
         ("ipfs", "Qm2", None, None)],
        "proto string, id string, parent string, name string")
    out = df.select(
        resource_uri(F.col("proto"), F.col("id")).alias("uri"),
        gateway_url(F.lit("http://gw"), F.col("id"),
                    F.col("parent"), F.col("name")).alias("gw")).collect()
    assert out[0]["uri"] == "ipfs://Qm1"
    assert out[0]["gw"] == "http://gw/ipfs/QmP/file%20name.epub"
    assert out[1]["gw"] == "http://gw/ipfs/Qm2"


def test_mime_gate_and_nsfw_stub(spark):
    df = spark.createDataFrame(
        [("u1", "image/jpeg", bytearray(b"\xff\xd8abc")),
         ("u2", "text/html", bytearray(b"<p>")),
         ("u3", "image/png", bytearray(b"\x89PNGxyz"))],
        "url string, content_type string, blob binary")
    gated = mime_gate(df, "content_type")
    assert {r["url"] for r in gated.collect()} == {"u1", "u3"}
    scores = {r["url"]: r for r in classify_nsfw_stub(gated).collect()}
    assert set(scores) == {"u1", "u3"}
    for r in scores.values():
        assert 0.0 <= r["neutral"] <= 1.0
    # deterministic: rerun gives identical scores
    again = {r["url"]: r for r in classify_nsfw_stub(gated).collect()}
    assert again == scores


def test_links_name_field_family(spark, tmp_path):
    """Directory child-link names as an analyzed field of the fielded index
    (the reference's directories links.Name,
    /root/reference/docs/indices/directories.json:19-27): searching a
    child's filename surfaces the parent directory doc."""
    import pyspark.sql.functions as F

    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.crawl import links_name_text
    from ipfs_search_spark.operators.index_build import build_fielded_index
    from ipfs_search_spark.operators.ingest import aggregate_links
    from ipfs_search_spark.plans.query import Searcher

    docs = spark.createDataFrame(
        [("d0", 0, "alpha beta", "ok"), ("d1", 1, "gamma delta", "ok"),
         ("d2", 2, "epsilon zeta", "ok")],
        "url string, doc_id long, text string, status string")
    edges = spark.createDataFrame(
        [(0, "report.pdf"), (0, "notes.txt"), (1, "photo.jpeg")],
        "doc_id long, name string")
    lnk = links_name_text(aggregate_links(edges, "doc_id", ["name"]),
                          "doc_id")
    docs = (docs.join(lnk, "doc_id", "left")
            .withColumn("links_name", F.coalesce("links_name", F.lit(""))))
    io = TableIO(spark, str(tmp_path / "linksidx"))
    build_fielded_index(spark, docs, io,
                        fields={"content": "text",
                                "links.name": "links_name"},
                        n_shards=2, n_buckets=8)
    sx = Searcher(spark, io)
    boosts = {"content": 1.0, "links.name": 1.5}
    hits = sx.search([(0, "report")], k=5, fields=boosts).collect()
    assert [r["doc_id"] for r in hits] == [0]  # dir found by child name
    hits2 = sx.search([(0, "photo alpha")], k=5, fields=boosts).collect()
    assert {r["doc_id"] for r in hits2} == {0, 1}
    # tokenizer splits the filename: extension is independently searchable
    hits3 = sx.search([(0, "jpeg")], k=5, fields=boosts).collect()
    assert [r["doc_id"] for r in hits3] == [1]
