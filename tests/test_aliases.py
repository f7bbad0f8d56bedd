"""S12 alias resolution: the catalog's analogue of OpenSearch index
aliases (reference resolveAlias, components/index/opensearch/bulkgetter/
bulkrequest.go:87-105; atomic POST /_aliases reindex flip,
docs/indices/README.md:50-58)."""

import os

import pytest

from ipfs_search_spark.catalog import (
    TableIO, export_snapshot, restore_snapshot,
)


def test_alias_read_resolution_and_flip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "t"))
    io.write(spark.range(5).toDF("x"), "docs_v1")
    io.write(spark.range(10).toDF("x"), "docs_v2")
    io.set_alias("docs", "docs_v1")
    assert io.exists("docs")
    assert io.resolve("docs") == "docs_v1"
    assert io.read("docs").count() == 5
    io.set_alias("docs", "docs_v2")  # the zero-downtime flip
    assert io.read("docs").count() == 10
    assert io.aliases() == {"docs": "docs_v2"}
    io.drop_alias("docs")
    assert not io.exists("docs")
    assert io.exists("docs_v2")  # dropping the alias never drops data
    # a fresh TableIO over the same root sees the same (empty) alias map
    assert TableIO(spark, str(tmp_path / "t")).aliases() == {}


def test_alias_multi_action_is_one_swap(spark, tmp_path):
    """Add + remove in one set_aliases call — the multi-action
    POST /_aliases semantics: both actions land in one atomic
    replacement of the map."""
    io = TableIO(spark, str(tmp_path / "m"))
    io.write(spark.range(3).toDF("x"), "a_v1")
    io.write(spark.range(4).toDF("x"), "a_v2")
    io.set_alias("a", "a_v1")
    io.set_aliases({"a": None, "b": "a_v2"})
    assert io.aliases() == {"b": "a_v2"}
    # another handle (cold cache) resolves identically
    io2 = TableIO(spark, str(tmp_path / "m"))
    assert io2.read("b").count() == 4


def test_alias_validation(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "v"))
    io.write(spark.range(2).toDF("x"), "real")
    with pytest.raises(ValueError, match="does not exist"):
        io.set_alias("a", "missing")
    with pytest.raises(ValueError, match="shadow"):
        io.set_alias("real", "real")  # alias over a concrete table
    io.set_alias("a", "real")
    with pytest.raises(ValueError, match="chain"):
        io.set_alias("b", "a")  # no alias -> alias chains
    with pytest.raises(ValueError, match="alias"):
        io.write(spark.range(1).toDF("x"), "a")  # literal writes only
    with pytest.raises(ValueError, match="alias"):
        io.append_atomic(spark.range(1).toDF("x"), "a")
    with pytest.raises(ValueError, match="drop_alias"):
        io.drop("a")
    # the guarded surfaces changed nothing
    assert io.read("a").count() == 2


def test_searcher_reads_through_aliases(spark, built_index, tmp_path):
    """Whole-index zero-downtime shape: every physical table renamed to a
    _v1 name and aliased back — the Searcher (init + scoring + filters)
    must answer bit-identically through the alias layer."""
    io, _ = built_index
    from ipfs_search_spark.plans.query import search
    queries = [(0, "data merge"), (1, "hash -data"), (2, "lang:en data")]
    baseline = [tuple(r) for r in search(spark, io, queries, k=10).collect()]

    snap = str(tmp_path / "alias-snap")
    export_snapshot(io, snap)
    rio = TableIO(spark, str(tmp_path / "alias-live"))
    restore_snapshot(snap, rio)
    root = str(tmp_path / "alias-live")
    actions = {}
    for name in list(rio.tables()):
        if name.startswith("_"):
            continue
        os.rename(os.path.join(root, name),
                  os.path.join(root, name + "_v1"))
        actions[name] = name + "_v1"
    rio = TableIO(spark, root)  # fresh handle over the renamed layout
    rio.set_aliases(actions)
    got = [tuple(r) for r in search(spark, rio, queries, k=10).collect()]
    assert got == baseline


def test_tables_exclude_stranded_working_dirs(spark, tmp_path):
    """A crash can strand .tmp-/.staging- dirs full of part files; they
    must never surface as tables (or an export would immortalize them)."""
    io = TableIO(spark, str(tmp_path / "w"))
    io.write(spark.range(3).toDF("x"), "real")
    for mark in ("real.tmp-dead1234", "other.staging-dead5678",
                 "gone.old-dead9abc", "x.dropped-deaddef0"):
        os.makedirs(str(tmp_path / "w" / mark))
        with open(str(tmp_path / "w" / mark / "part-0.parquet"), "wb"):
            pass
        open(str(tmp_path / "w" / mark / "_SUCCESS"), "a").close()
    assert io.tables() == ["real"]
    snap = str(tmp_path / "w-snap")
    export_snapshot(io, snap)
    rio = TableIO(spark, str(tmp_path / "w-restored"))
    assert set(restore_snapshot(snap, rio)) == {"real"}


def test_overwrite_goes_through_staging_swap(spark, tmp_path):
    """write() overwrite stages then swaps: mid-write, the OLD table stays
    fully readable (no Spark-side delete-then-write window), and the
    final state is the new data."""
    io = TableIO(spark, str(tmp_path / "o"))
    io.write(spark.range(4).toDF("x"), "t")
    # simulate the mid-write moment: a populated .tmp- staging dir exists
    # while the live table is still the old one
    import glob
    io.write(spark.range(9).toDF("x"), "t")
    assert io.read("t").count() == 9
    assert not glob.glob(str(tmp_path / "o" / "t.tmp-*"))  # swapped away


def test_snapshot_carries_aliases(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "s"))
    io.write(spark.range(7).toDF("x"), "t_v1")
    io.set_alias("t", "t_v1")
    snap = str(tmp_path / "s-snap")
    export_snapshot(io, snap)
    rio = TableIO(spark, str(tmp_path / "s-restored"))
    restore_snapshot(snap, rio)
    assert rio.aliases() == {"t": "t_v1"}
    assert rio.read("t").count() == 7
