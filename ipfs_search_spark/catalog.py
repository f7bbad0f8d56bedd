"""Storage abstraction: Iceberg in production, parquet in the sandbox.

The engine's durable artifacts (pages, documents, postings, index_stats,
checkpoints) are Iceberg tables in production — atomic commits give us the
exactly-once write semantics the reference gets from OpenSearch bulk-indexer
acks (reference: components/index/opensearch/index.go:59-118) and snapshot
export (reference: docs/snapshots.md). This container has no Iceberg runtime
jar, so `TableIO` falls back to plain parquet paths with write-then-rename
atomicity at the directory level; the calling code is identical either way.

Production setup (documented, not exercised here)::

    spark.sql.catalog.ix = org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.ix.type = hadoop | hive | rest
    TableIO(spark, root="ix.search")   # table names become ix.search.<name>

Partitioning strategy at 100 TB:
- pages:     partitioned by days(warc_ts)  — time-pruned incremental builds
- documents: bucket(url, 1024)             — co-located MERGE/anti-join
- postings:  bucket(term, N_BUCKETS)       — query probe touches 1 bucket/term
- checkpoints: tiny, unpartitioned
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Read/write named engine tables on Iceberg or a parquet root dir."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.iceberg = "/" not in root and _iceberg_available(spark)

    def _path(self, name: str) -> str:
        return f"{self.root}.{name}" if self.iceberg else os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(self._path(name))
        p = self._path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(self._path(name))
        return self.spark.read.parquet(self._path(name))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> None:
        if self.iceberg:
            w = df.writeTo(self._path(name))
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append_atomic(self, df: DataFrame, name: str) -> None:
        """Idempotent-friendly append: Iceberg append is atomic; the parquet
        fallback stages to a temp dir then moves files in (commit point)."""
        if self.iceberg:
            self.write(df, name, mode="append")
            return
        dest = self._path(name)
        staging = dest + ".staging-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(staging)
        os.makedirs(dest, exist_ok=True)
        for f in os.listdir(staging):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(staging, f),
                    os.path.join(dest, uuid.uuid4().hex[:8] + "-" + f),
                )
        for f in os.listdir(staging):
            os.remove(os.path.join(staging, f))
        os.rmdir(staging)
        open(os.path.join(dest, "_SUCCESS"), "a").close()
