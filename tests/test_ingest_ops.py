"""Unit tests for the reference crawler semantics (SURVEY.md §2), mirroring
the reference's crawler behavior matrix
(/root/reference/components/crawler/crawler_test.go scenarios)."""

import datetime as dt

import pyspark.sql.functions as F

from ipfs_search_spark.operators import ingest

TS = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ts(**kw):
    return TS + dt.timedelta(**kw)


def test_latest_wins(spark):
    df = spark.createDataFrame(
        [("u1", _ts(hours=1), "a"), ("u1", _ts(hours=5), "b"),
         ("u2", _ts(), "c")],
        "url string, warc_ts timestamp, payload string")
    out = {r["url"]: r["payload"]
           for r in ingest.latest_wins(df, "url", "warc_ts").collect()}
    assert out == {"u1": "b", "u2": "c"}


def test_first_last_seen_truncates_seconds(spark):
    df = spark.createDataFrame(
        [("u", TS.replace(microsecond=999999)),
         ("u", _ts(days=2))],
        "url string, ts timestamp")
    r = ingest.first_last_seen(df, "url", "ts").collect()[0]
    assert r["first_seen"].microsecond == 0
    assert r["n_sightings"] == 2


def test_anti_join_and_multiget(spark):
    batch = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    files = spark.createDataFrame([(1,)], "fid long")
    dirs = spark.createDataFrame([(2,), (1,)], "did long")
    new = ingest.anti_join_new(batch, files.select(F.col("fid").alias("id")),
                               "id")
    assert {r["id"] for r in new.collect()} == {2, 3}
    probed = ingest.multiget_probe(
        batch, [("files", files, "fid"), ("dirs", dirs, "did")], "id")
    got = {r["id"]: r["found_in"] for r in probed.collect()}
    # first-match priority: id=1 exists in both stores -> 'files' wins
    # (reference probes Files before Directories, crawler/existingitem.go:18)
    assert got == {1: "files", 2: "dirs", 3: "missing"}


def test_merge_references_set_union(spark):
    old = spark.createDataFrame([("u", "p1", "n1")],
                                "url string, parent_hash string, name string")
    new = spark.createDataFrame(
        [("u", "p1", "n1"), ("u", "p1", "n2"), ("u", "p2", "n1")],
        "url string, parent_hash string, name string")
    out = ingest.merge_references(old, new)
    # same parent under a different name IS a new reference
    # (reference: TestCrawlSameReferenceDifferentName, crawler_test.go:1334)
    assert out.count() == 3


def test_hysteresis_blocks_young_updates(spark):
    state = spark.createDataFrame([("u1", TS), ("u2", TS)],
                                  "url string, last_seen timestamp")
    batch = spark.createDataFrame(
        [("u1", _ts(minutes=30)),   # < 1h newer: suppressed
         ("u2", _ts(hours=2))],     # > 1h newer: applied
        "url string, ts timestamp")
    out = {r["url"]: r["last_seen_effective"]
           for r in ingest.update_last_seen_hysteresis(
               state, batch, "url").collect()}
    assert out["u1"] == TS
    assert out["u2"] == _ts(hours=2)


def test_classify_status_partial_rule(spark):
    df = spark.createDataFrame(
        [(1, 100, None), (2, 262144, None), (3, 262144, "parent"),
         (4, 2 << 20, None), (5, 0, None)],
        "id long, size long, parent string")
    got = {r["id"]: r["status"]
           for r in ingest.classify_status(df, "size", "parent").collect()}
    # 256KiB unreferenced -> partial; same size WITH parent -> ok
    # (reference: /root/reference/components/protocol/ipfs/stat.go:66-68)
    assert got == {1: "ok", 2: "partial", 3: "ok",
                   4: "invalid_too_large", 5: "partial"}


def test_aggregate_links_cap(spark):
    rows = [("d1", i, f"c{i}") for i in range(10)] + [("d2", 0, "x")]
    df = spark.createDataFrame(rows, "parent string, idx int, name string")
    out = {r["parent"]: r for r in ingest.aggregate_links(
        df, "parent", ["idx", "name"], cap=4).collect()}
    assert out["d1"]["dir_status"] == "invalid"
    assert len(out["d1"]["links"]) == 4  # capped but kept
    assert out["d2"]["dir_status"] == "ok"
    assert out["d1"]["n_links"] == 10


def test_merge_documents_upsert(spark):
    state = spark.createDataFrame(
        [("u1", TS, TS, [("p1", "n1")])],
        "url string, first_seen timestamp, last_seen timestamp, "
        "references array<struct<parent_hash:string,name:string>>")
    batch = spark.createDataFrame(
        [("u1", _ts(days=1), _ts(days=1), [("p1", "n1"), ("p2", "n2")]),
         ("u9", _ts(), _ts(), [("p3", "n3")])],
        "url string, first_seen timestamp, last_seen timestamp, "
        "references array<struct<parent_hash:string,name:string>>")
    out = {r["url"]: r for r in
           ingest.merge_documents(state, batch).collect()}
    assert set(out) == {"u1", "u9"}
    assert out["u1"]["first_seen"] == TS            # min kept
    assert out["u1"]["last_seen"] == _ts(days=1)    # >1h newer applied
    assert len(out["u1"]["references"]) == 2        # set union
    assert out["u9"]["references"][0]["parent_hash"] == "p3"
