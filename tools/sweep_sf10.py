"""The 100×-rows survival sweep, re-runnable per row (VERDICT r10
Next #8's sweep-freshness rule + r11 Next #4's age-refresh): run named
contract rows END-TO-END at a scaled sf_dir (default /tmp/sf10, built
with tools/make_scaled_sf.py), each in its OWN subprocess — cold
session, the bench config (8 GiB driver unless $SPARK_GRAFT_DRIVER_MEM
overrides), noop-forced single pass — and print one JSON line per row
plus a final summary line for SCALE.md.

Usage:
    python tools/sweep_sf10.py [--sf DIR] row [row ...]
    python tools/sweep_sf10.py --one DIR row      # internal child
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_one(sf_dir: str, row: str) -> None:
    import __spark_entry__ as em
    from mod_reservoir_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("sweep", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**em.retired_queries(), **em.queries()}
    fn = qs[row]
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    dt = round(time.time() - t0, 1)
    print(json.dumps({"row": row, "sf_dir": sf_dir, "cold_sec": dt}))


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--one":
        run_one(argv[1], argv[2])
        return 0
    sf_dir = "/tmp/sf10"
    if argv and argv[0] == "--sf":
        sf_dir = argv[1]
        argv = argv[2:]
    rows = argv
    if not rows:
        print("usage: sweep_sf10.py [--sf DIR] row [row ...]",
              file=sys.stderr)
        return 2
    results = {}
    for row in rows:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 sf_dir, row],
                capture_output=True, text=True, cwd=ROOT, timeout=3600,
            )
        except subprocess.TimeoutExpired:
            # a hung row must not abort the whole sweep and discard
            # every remaining row's result (ADVICE r12) — record it
            # like any other per-row failure and continue
            results[row] = {"error": "timeout"}
            print(json.dumps({"row": row, "error": "timeout"}),
                  flush=True)
            continue
        line = [
            ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")
        ]
        if out.returncode != 0 or not line:
            results[row] = {"error": out.stderr[-500:]}
            print(json.dumps({"row": row, "error": out.stderr[-500:]}),
                  flush=True)
            continue
        r = json.loads(line[-1])
        results[row] = r
        print(json.dumps(r), flush=True)
    print(json.dumps({"sweep": sf_dir, "rows": {
        k: v.get("cold_sec", "ERROR") for k, v in results.items()
    }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
