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
    # bench prints ONE JSON line (the last line of stdout). A missing
    # or malformed line used to raise a bare IndexError that threw
    # away every already-completed run (ADVICE r11) — fail with the
    # captured output instead so the operator can see what bench did.
    lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not lines:
        raise RuntimeError(
            f"bench run {i} rc=0 but printed no JSON line.\n"
            f"stdout tail: {out.stdout[-1000:]!r}\n"
            f"stderr tail: {out.stderr[-1000:]!r}"
        )
    return json.loads(lines[-1])


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
    # runs can disagree on query sets (a contract rotation between
    # draws); indexing blindly raised KeyError and lost every run
    # (ADVICE r11) — aggregate over the intersection and say what was
    # dropped
    common = set(runs[0]["queries"])
    for r in runs[1:]:
        common &= set(r["queries"])
    dropped = sorted(set().union(*(r["queries"] for r in runs)) - common)
    if dropped:
        print(
            f"WARNING: {len(dropped)} queries not present in every "
            f"run, excluded from the artifact: {dropped}",
            flush=True,
        )
    names = sorted(common)
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
