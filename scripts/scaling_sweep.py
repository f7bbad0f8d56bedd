#!/usr/bin/env python
"""Multi-size strong-scaling sweep: the same build at local[2] vs local[8]
across growing corpus sizes, each a fully gated bench.scaling_run session
appended to SCALING_SWEEP.json (BENCH.md re-renders from that history).

The point (r2 verdict): the Amdahl curve. Fixed per-build driver overhead
(JVM job scheduling, commit listing, stats jobs) is constant while the
parallel fraction grows with corpus size, so efficiency must rise
monotonically toward the machine's bandwidth envelope — which is the
production story, since at 100 TB the fixed overhead is ~0.

Usage:  python scripts/scaling_sweep.py [size:rounds ...]
Default sizes: 480000:3 1200000:2 2400000:2  (~1.5-2 h total; do NOT run
any other Spark workload concurrently — shared-host timing, CLAUDE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    specs = sys.argv[1:] or ["480000:3", "1200000:2", "2400000:2"]
    for spec in specs:
        size_s, _, rounds_s = spec.partition(":")
        n_pages, rounds = int(size_s), int(rounds_s or 2)
        print(f"=== sweep: {n_pages} pages, {rounds} gated rounds ===",
              flush=True)
        res = bench.scaling_run(n_pages, rounds=rounds)
        print(json.dumps(res), flush=True)
    print("=== sweep summary ===", flush=True)
    print(json.dumps(bench.sweep_summary(), indent=1))


if __name__ == "__main__":
    main()
