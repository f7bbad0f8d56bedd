"""Structured Streaming execution of the sniffer semantics (real streaming
query via the file source, not just the batch analogue)."""

import os
import shutil
import tempfile

import pytest

from ipfs_search_spark.streaming.ingest_stream import sniffer_stream


@pytest.fixture()
def stream_dirs():
    src = tempfile.mkdtemp(prefix="isx-stream-src-")
    ckpt = tempfile.mkdtemp(prefix="isx-stream-ckpt-")
    yield src, ckpt
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_sniffer_stream_dedups_and_filters(spark, stream_dirs):
    src, ckpt = stream_dirs
    rows = [
        ("https://a.example/x", "2024-01-01 10:00:00"),
        ("https://a.example/x", "2024-01-01 10:20:00"),  # re-sighting: drop
        ("https://b.example/y", "2024-01-01 10:05:00"),
        ("not a url", "2024-01-01 10:06:00"),            # invalid: drop
    ]
    df = spark.createDataFrame(rows, "url string, ts string").selectExpr(
        "url", "cast(ts as timestamp) as warc_ts")
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, "batch0"))

    stream = (spark.readStream
              .schema("url string, warc_ts timestamp")
              .parquet(os.path.join(src, "batch0")))
    out = sniffer_stream(stream, dedup_window="1 hour")
    q = (out.writeStream.format("memory").queryName("sniffed")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["url"]) for r in spark.sql("SELECT * FROM sniffed").collect()}
    assert got == {"https://a.example/x", "https://b.example/y"}


def test_incremental_index_microbatch(spark, stream_dirs):
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.fixtures import pages_df
    from ipfs_search_spark.streaming.ingest_stream import (
        incremental_index_microbatch,
    )
    _, ckpt = stream_dirs
    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-inc-"))
    handle = incremental_index_microbatch(io, n_shards=2, n_buckets=4)
    batch = pages_df(spark, n=50, seed=9).withColumnRenamed("text", "_gold") \
        .withColumnRenamed("_gold", "text")
    handle(batch, batch_id=0)
    assert io.read("documents").count() > 0
    seg = io.read("posting_segments")
    assert seg.filter("segment_id = 0").count() > 0
    handle(spark.createDataFrame([], batch.schema), batch_id=1)  # empty batch
