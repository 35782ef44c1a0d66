"""The r8 median-and-spread adjudication protocol (VERDICT r10 Next
#1): run bench.py N times as INDEPENDENT processes (fresh JVM each —
same-process repeats share codegen caches and understate variance),
then write one artifact carrying, per query and for the headline sum:
the median, the min-max spread, and every raw run — so a docs claim
can cite median AND spread instead of a single draw on a box with
documented 1.5x run-to-run variance.

Usage:
    python tools/bench_median.py [N] [out.json]
Defaults: N=3, out=BENCH_ADJUDICATED.json (repo root). bench.py's own
env knobs ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS, $SPARK_GRAFT_REPEATS)
apply to each run unchanged.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(i: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        cwd=ROOT,
        timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"bench run {i} failed rc={out.returncode}:\n{out.stderr[-2000:]}"
        )
    # bench prints ONE JSON line (the last line of stdout)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        ROOT, "BENCH_ADJUDICATED.json"
    )
    runs = []
    for i in range(n):
        r = one_run(i)
        runs.append(r)
        print(
            f"run {i}: headline {r['value']} s "
            f"({r['metric']}, sf {r['sf']})",
            flush=True,
        )
    names = sorted(runs[0]["queries"])
    queries = {}
    for q in names:
        vals = [r["queries"][q] for r in runs]
        queries[q] = {
            "median": round(statistics.median(vals), 3),
            "min": min(vals),
            "max": max(vals),
            "runs": vals,
        }
    headlines = [r["value"] for r in runs]
    artifact = {
        "protocol": f"{n} independent bench.py processes, "
        "per-query median + spread (r8 adjudication protocol)",
        "metric": runs[0]["metric"],
        "sf": runs[0]["sf"],
        "headline": {
            "median": round(statistics.median(headlines), 3),
            "min": min(headlines),
            "max": max(headlines),
            "runs": headlines,
        },
        "queries": queries,
    }
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        f"headline median {artifact['headline']['median']} s, "
        f"spread [{artifact['headline']['min']}, "
        f"{artifact['headline']['max']}] -> {dest}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
