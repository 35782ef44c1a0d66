"""Interleaved same-session A/B of the spread_input gate: for each
named query, alternate ON (real spread_input) and OFF (identity
monkeypatch) repeats inside ONE Spark session so box-period noise hits
both arms equally (guide §1 — measure the change, not the weather).

Usage: python tools/ab_spread.py q1 [q2 ...] [--reps N] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark
    from mod_reservoir_spark.pipeline import spread as spread_mod

    real = spread_mod.spread_input
    ident = lambda df: df  # noqa: E731

    def set_arm(on: bool):
        # patch EVERY module that bound the symbol at import time
        fn = real if on else ident
        for m in list(sys.modules.values()):
            if m is not None and getattr(m, "spread_input", None) in (
                real,
                ident,
            ):
                m.spread_input = fn

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_spread", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        for on in (True, False):  # warm both shapes at tiny SF
            set_arm(on)
            if os.path.isdir(WARMUP_SF_DIR):
                fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark.catalog.clearCache()
        runs = {"on": [], "off": []}
        for r in range(args.reps):
            for on in (True, False):
                set_arm(on)
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs["on" if on else "off"].append(
                    round(time.time() - t0, 3)
                )
                spark.catalog.clearCache()
        out[name] = {
            "on_min": min(runs["on"]),
            "off_min": min(runs["off"]),
            "on": runs["on"],
            "off": runs["off"],
        }
        print(
            f"{name:24s} on_min={min(runs['on']):7.2f} "
            f"off_min={min(runs['off']):7.2f} on={runs['on']} off={runs['off']}",
            flush=True,
        )
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
