"""Capture .explain("formatted") for contract queries into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-eval nodes — before and after every change).

Usage:
    python tools/capture_plans.py --tag r13 --suffix before [q1 q2 ...]

With no query names, captures every live + retired query. Queries whose
construction itself drives jobs (streaming state builds, trained models)
still produce the plan of their FINAL returned frame.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("capture_plans", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    names = args.queries or list(qs)
    unknown = [q for q in names if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    outdir = os.path.join(ROOT, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    failed = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture what we can, keep going
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:200]}")
            continue
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if j in plan
        ]
        py = [
            p
            for p in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                      "MapInPandas", "FlatMapGroupsInPandas")
            if p in plan
        ]
        print(f"{name}: {n_ex} Exchange; joins={joins or '-'}; py={py or '-'}")
    if failed:
        print(f"failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
