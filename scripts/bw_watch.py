"""Log the DRAM-bandwidth scaling envelope every few minutes.

Writes one JSON line per probe to /tmp/bw_watch.jsonl so a long round can
spot a quiet window (envelope >= threshold) for running the scaling sweep.
The probe itself is a few seconds of pinned memcpy + a short CPU probe --
cheap enough to run alongside correctness (non-timing) work.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

LOG = "/tmp/bw_watch.jsonl"
FLAG = "/tmp/bw_quiet.flag"
THRESH = float(os.environ.get("BW_WATCH_THRESH", "0.75"))
INTERVAL = float(os.environ.get("BW_WATCH_INTERVAL", "360"))

while True:
    try:
        bw = bench.bw_envelope_probe()
        cpu = bench.cpu_probe()
        rec = {"ts": time.strftime("%H:%M:%S"), "bw": bw, "cpu": round(cpu, 3)}
        with open(LOG, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if bw >= THRESH and cpu < 2.5:
            with open(FLAG, "w") as f:
                f.write(json.dumps(rec) + "\n")
    except Exception as e:  # keep watching through transient failures
        with open(LOG, "a") as f:
            f.write(json.dumps({"ts": time.strftime("%H:%M:%S"), "err": str(e)}) + "\n")
    time.sleep(INTERVAL)
