"""SparkSession factory with scale-appropriate defaults.

Local tests run on local[N]; production is spark-submit --py-files on a
multi-executor cluster. All configs here are safe in both modes. AQE is on so
skewed term partitions get split at runtime (the salted-shuffle in
operators/index_build.py handles the pathological stopword case explicitly;
AQE covers the long tail).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ipfs-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 8 MiB advisory target (default 64 MiB): AQE otherwise coalesces
        # the build's encode shuffle to ~1× the slot count, and with
        # Zipf-skewed (bucket, shard) cells those few fat tasks leave a
        # long straggler tail (measured: postings stage 36.8 s → 23.5 s at
        # local[8] from this alone). Finer targets keep ≥3-4 waves of
        # tasks per slot so uneven cells pack; same rule a 1000-executor
        # cluster needs — never let AQE collapse a skewed stage to ~#slots.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # Arrow everywhere: pandas UDFs are the only Python on the hot path.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # 128 MiB scan splits — right-sized tasks at 100 TB too.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
