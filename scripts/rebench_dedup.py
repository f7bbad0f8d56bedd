#!/usr/bin/env python
"""Targeted quiet-window re-bench of the dedup/LSH family (r4 verdict #2).

The r4 bench recorded q_lsh_neardup 7.75->10.52 s, q_fingerprint_lookup
5.39->6.35 s, q_simhash_neardup 6.93->7.37 s with ZERO changes to dedup.py
that round. Root cause candidate (disclosed in BENCH.md): the background
envelope watcher (scripts/bw_watch.py, 8-process memcpy+md5 bursts every
360 s) ran DURING the r4 bench. This script re-times exactly
bench.bench_table_ops() — same session shape (local[CPUS]), warmed JVM,
same query order — in a fresh subprocess, and appends the result to
DEDUP_REBENCH.json so bench.py's BENCH.md renderer can report the
controlled data point. Run it only in a quiet window (check
bench.cpu_probe() ~<2.5 first) with no other Spark workload live.

    python scripts/rebench_dedup.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "DEDUP_REBENCH.json")


def _worker() -> None:
    import tempfile

    import bench
    spark = bench._new_spark(bench.CPUS)
    try:
        bench.warm_jvm(spark)
        os.environ.setdefault("SPARK_GRAFT_PAGES_DIR",
                              tempfile.mkdtemp(prefix="isx-rebench-pages-"))
        res = bench.bench_table_ops(spark)
    finally:
        spark.stop()
    print("RESULT " + json.dumps(res))


def main() -> None:
    import bench
    probe_before = round(bench.cpu_probe(), 2)
    bw_before = bench.bw_envelope_probe()
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker"],
        capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    probe_after = round(bench.cpu_probe(), 2)
    entry = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
             "probe_before_sec": probe_before,
             "probe_after_sec": probe_after,
             "bw_eff_before": bw_before,
             "wall_min": round((time.time() - t0) / 60, 1),
             "queries": res}
    hist = []
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                hist = json.load(f)
        except (ValueError, OSError):
            hist = []
    hist.append(entry)
    with open(OUT, "w") as f:
        json.dump(hist, f, indent=1)
    print(json.dumps(entry))


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker()
    else:
        main()
