#!/usr/bin/env python
"""Per-phase Amdahl profile of the scaling-bench build: mirrors
build_index()'s four phases with explicit timing fences so the serial
(non-scaling) seconds can be attributed. Run once per parallelism level in
a FRESH process (PySpark reuses one aged JVM per process — CLAUDE.md):

    python scripts/profile_build.py 2 [corpus_dir]
    python scripts/profile_build.py 8 [corpus_dir]

Prints one JSON line with per-phase seconds. A phase whose lo/hi ratio is
~1 is fixed driver overhead — the term that caps strong-scaling efficiency
at bench corpus sizes (SCALE.md quantifies why it vanishes at 100 TB).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else \
        "/dev/shm/isx-scale-corpus-480k"
    import bench
    nshuf = os.environ.get("SPARK_GRAFT_PROF_SHUFFLE")
    if nshuf:
        from ipfs_search_spark.session import get_spark

        def _patched(cpus_, local_dir=None):
            extra = {"spark.local.dir": local_dir} if local_dir else None
            return get_spark(f"isx-prof-{cpus_}", master=f"local[{cpus_}]",
                             shuffle_partitions=int(nshuf),
                             extra_conf=extra)
        bench._new_spark = _patched
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.index_build import (
        build_postings, canonical_documents,
    )
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    shm = "/dev/shm"
    shuffle_dir = tempfile.mkdtemp(prefix=f"isx-prof-shuf-{cpus}-", dir=shm)
    spark = bench._new_spark(cpus, local_dir=shuffle_dir)
    bench.warm_jvm(spark)
    workdir = tempfile.mkdtemp(prefix=f"isx-prof-{cpus}-", dir=shm)
    io = TableIO(spark, workdir)
    pages = spark.read.parquet(corpus)
    t: dict[str, float] = {}
    t0 = time.monotonic()

    docs = canonical_documents(pages)
    obs = Observation("doc_stats")
    ok = (F.col("status") == "ok") & (F.col("dl") > 0)
    io.write(docs.observe(obs,
                          F.count(F.when(ok, F.lit(1))).alias("n"),
                          F.sum(F.when(ok, F.col("dl"))).alias("sdl")),
             "documents")
    row = obs.get
    n_docs, total_dl = int(row["n"] or 0), int(row["sdl"] or 0)
    t["documents_write"] = time.monotonic() - t0

    t1 = time.monotonic()
    docs = io.read("documents")
    postings = build_postings(docs, n_shards=max(4, bench.CPUS // 4),
                              n_buckets=64)
    postings = (postings.repartition(64, "bucket")
                .sortWithinPartitions("term", "shard"))
    io.write(postings, "postings", partition_by=["bucket"])
    t["postings_write"] = time.monotonic() - t1

    t2 = time.monotonic()
    postings = io.read("postings")
    term_stats = postings.groupBy("term").agg(
        F.first("bucket").alias("bucket"),
        F.sum("df_part").alias("df"),
        F.sum("cf_part").alias("cf"))
    io.write(term_stats.sortWithinPartitions("term"), "term_stats")
    t["term_stats_write"] = time.monotonic() - t2

    t3 = time.monotonic()
    io.write_rows(
        "index_stats",
        [(n_docs, float(total_dl) / n_docs if n_docs else 0.0,
          max(4, bench.CPUS // 4), 64, 128, False, total_dl)],
        "n_docs long, avgdl double, n_shards int, n_buckets int, "
        "block_size int, positional boolean, total_dl long")
    t["stats_write"] = time.monotonic() - t3
    t["total"] = time.monotonic() - t0
    out = {"cpus": cpus, "n_docs": n_docs,
           "phases": {k: round(v, 3) for k, v in t.items()},
           "probe_before": None}
    spark.stop()
    import shutil
    shutil.rmtree(workdir, ignore_errors=True)
    shutil.rmtree(shuffle_dir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
