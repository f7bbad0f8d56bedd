"""S15 snapshot export/restore: a restored index answers queries
identically to the original (the reference's OpenSearch snapshot/restore,
/root/reference/docs/snapshots.md)."""

import pytest

from ipfs_search_spark.catalog import (
    TableIO, export_snapshot, restore_snapshot,
)


def test_snapshot_roundtrip_search_identical(spark, built_index, tmp_path):
    io, _ = built_index
    from ipfs_search_spark.plans.query import search
    snap = str(tmp_path / "snap")
    manifest = export_snapshot(io, snap)
    assert manifest["documents"] > 0 and manifest["postings"] > 0
    assert "index_stats" in manifest and "term_stats" in manifest

    rio = TableIO(spark, str(tmp_path / "restored"))
    restored = restore_snapshot(snap, rio)
    assert restored == manifest

    orig = search(spark, io, [(0, "data merge"), (1, "hash -data")],
                  k=20).collect()
    got = search(spark, rio, [(0, "data merge"), (1, "hash -data")],
                 k=20).collect()
    assert [tuple(r) for r in orig] == [tuple(r) for r in got]
    # partition layout preserved (postings stay bucket-partitioned)
    import os
    assert any("bucket=" in f for f in
               os.listdir(str(tmp_path / "restored" / "postings")))


def test_restore_rejects_torn_snapshot(spark, built_index, tmp_path):
    import shutil
    io, _ = built_index
    snap = str(tmp_path / "snap2")
    export_snapshot(io, snap)
    shutil.rmtree(snap + "/term_stats")
    with pytest.raises(ValueError, match="missing"):
        restore_snapshot(snap, TableIO(spark, str(tmp_path / "r2")))
    # no manifest at all → torn export
    with pytest.raises(ValueError, match="manifest"):
        restore_snapshot(str(tmp_path / "nowhere"),
                         TableIO(spark, str(tmp_path / "r3")))


def test_snapshot_multilevel_partitioning(spark, tmp_path):
    """A table written with TWO partition levels must snapshot/restore with
    the full partition spec (r2 advice: _partition_cols stopped at the
    first `k=` level)."""
    from ipfs_search_spark.catalog import _partition_cols

    io = TableIO(spark, str(tmp_path / "ml-src"))
    df = spark.createDataFrame(
        [(b, s, i) for b in range(2) for s in range(2) for i in range(5)],
        "bucket int, shard int, v int")
    io.write(df, "t2", partition_by=["bucket", "shard"])
    assert _partition_cols(io, "t2") == ["bucket", "shard"]

    snap = str(tmp_path / "ml-snap")
    export_snapshot(io, snap)
    rio = TableIO(spark, str(tmp_path / "ml-restored"))
    restore_snapshot(snap, rio)
    assert _partition_cols(rio, "t2") == ["bucket", "shard"]
    # partitioned reads append partition columns last — compare by name
    got = rio.read("t2").select("bucket", "shard", "v").collect()
    assert sorted(tuple(r) for r in got) == \
        sorted(tuple(r) for r in df.collect())
