"""Isolated per-query timing for optimization work (guide §1.1/§1.4):
time a NAMED SUBSET of contract queries with the noop sink in one
session, median of N repeats, warmup at sf0.001 first — the same
methodology as bench.py but scoped so an optimization loop doesn't pay
the full basket per measurement.

Usage:
    python tools/time_queries.py q1 [q2 ...] [--repeats N] [--sf DIR]
                                  [--json out.json]

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py (this tool never
replaces bench.py for cross-round numbers — bench.py stays the contract).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("time_queries", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        if WARMUP_SF_DIR != args.sf and os.path.isdir(WARMUP_SF_DIR):
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        runs: list[float] = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        med = round(statistics.median(runs), 3)
        out[name] = {"median": med, "runs": runs}
        print(f"{name}: median {med}s  runs {runs}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
