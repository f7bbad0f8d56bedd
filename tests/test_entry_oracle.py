"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count + schema-width + order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con.execute(sql).fetchdf()


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 9)
    if hasattr(val, "isoformat"):
        return val.isoformat()[:26]
    if isinstance(val, bool):
        return bool(val)
    return val


def _rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    ddf = _duck(ORACLES[name])
    dcols = list(ddf.columns)
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    drows = list(ddf.itertuples(index=False, name=None))
    assert len(srows) == len(drows), \
        f"{name}: rows {len(srows)} vs oracle {len(drows)}"
    sset = _rowset([tuple(r[c] for c in scols) for r in srows], scols)
    dset = _rowset(drows, dcols)
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "score", "rank"} <= set(df.columns)
