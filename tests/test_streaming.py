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


def _planted_events(spark):
    rows = [
        # two 15-min buckets of 'view', one of 'click', a late straggler
        ("view", "2024-01-01 10:01:00", 1.0),
        ("view", "2024-01-01 10:07:00", 2.0),
        ("view", "2024-01-01 10:16:00", 4.0),
        ("click", "2024-01-01 10:02:00", 8.0),
        ("view", "2024-01-01 10:44:00", 16.0),
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts string, value double").selectExpr(
        "event_type", "cast(ts as timestamp) as ts", "value")


def _flat_parquet(df, out_path, mtime):
    """Write df as ONE flat parquet file at out_path (the streaming file
    source does not recurse into subdirectories) with a pinned mtime (the
    source orders files by modification time)."""
    d = tempfile.mkdtemp(prefix="isx-flat-")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    shutil.copyfile(os.path.join(d, part), out_path)
    os.utime(out_path, (mtime, mtime))
    shutil.rmtree(d, ignore_errors=True)


def test_rate_windows_tumbling_stream_matches_batch(spark, stream_dirs):
    """T7 tumbling windows: the REAL streaming rollup (watermark + append
    mode) emits exactly the batch windowed groupBy, epoch-aligned."""
    from ipfs_search_spark.streaming.ingest_stream import rate_windows
    src, ckpt = stream_dirs
    ev = _planted_events(spark)
    _flat_parquet(ev, os.path.join(src, "batch-000.parquet"), 1000)
    # sentinel far in the future advances the watermark past every window
    sentinel = spark.createDataFrame(
        [("sentinel", "2024-02-01 00:00:00", 0.0)],
        "event_type string, ts string, value double").selectExpr(
        "event_type", "cast(ts as timestamp) as ts", "value")
    _flat_parquet(sentinel, os.path.join(src, "batch-001.parquet"), 2000)

    stream = (spark.readStream
              .schema("event_type string, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = rate_windows(stream, "ts", window="15 minutes",
                       keys=("event_type",), value_col="value")
    q = (out.writeStream.format("memory").queryName("rates")
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(str(r["window_start"]), str(r["window_end"]), r["event_type"],
            r["n_events"], r["sum_value"])
           for r in spark.table("rates").collect()
           if r["event_type"] != "sentinel"}
    want = {(str(r["window_start"]), str(r["window_end"]), r["event_type"],
             r["n_events"], r["sum_value"])
            for r in rate_windows(ev, "ts", window="15 minutes",
                                  keys=("event_type",),
                                  value_col="value").collect()}
    assert got == want
    # epoch alignment + planted contents
    assert ("2024-01-01 10:00:00", "2024-01-01 10:15:00", "view", 2, 3.0) \
        in got
    assert ("2024-01-01 10:15:00", "2024-01-01 10:30:00", "view", 1, 4.0) \
        in got
    assert ("2024-01-01 10:00:00", "2024-01-01 10:15:00", "click", 1, 8.0) \
        in got


def test_rate_windows_sliding(spark):
    """Sliding windows: every event lands in window/slide overlapping
    windows, so total n_events is exactly doubled at 30min/15min."""
    from ipfs_search_spark.streaming.ingest_stream import rate_windows
    ev = _planted_events(spark)
    tumb = rate_windows(ev, "ts", window="30 minutes")
    slid = rate_windows(ev, "ts", window="30 minutes", slide="15 minutes")
    n = ev.count()
    assert sum(r["n_events"] for r in tumb.collect()) == n
    assert sum(r["n_events"] for r in slid.collect()) == 2 * n
    # a specific overlapped window
    rows = {(str(r["window_start"]), r["n_events"])
            for r in slid.collect()}
    assert ("2024-01-01 09:45:00", 3) in rows  # covers 10:01,10:07,10:02
    assert ("2024-01-01 10:00:00", 4) in rows  # + 10:16


def test_rate_windows_session(spark):
    """Session windows: gaps > session_gap split islands; extent is
    dynamic (first event .. last event + gap)."""
    from ipfs_search_spark.streaming.ingest_stream import rate_windows
    ev = _planted_events(spark).filter("event_type = 'view'")
    out = rate_windows(ev, "ts", session_gap="10 minutes").collect()
    got = {(str(r["window_start"]), str(r["window_end"]), r["n_events"])
           for r in out}
    # 10:01,10:07,10:16 chain (gaps 6m, 9m) then 10:44 alone
    assert got == {
        ("2024-01-01 10:01:00", "2024-01-01 10:26:00", 3),
        ("2024-01-01 10:44:00", "2024-01-01 10:54:00", 1),
    }
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rate_windows(ev, "ts", slide="5 minutes", session_gap="10 minutes")
