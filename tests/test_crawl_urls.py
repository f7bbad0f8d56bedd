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
