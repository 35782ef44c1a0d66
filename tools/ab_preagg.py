"""Interleaved same-session A/B of the n-gram position builders'
per-document pre-aggregation (commit 9e81b51 dropped it): for each
named query, alternate CUR (HEAD: occurrence rows, tf=1) and PRE
(old: groupBy(doc_id, w1..wk) partials) repeats inside ONE Spark
session so box-period noise hits both arms equally (guide §1).

Usage: python tools/ab_preagg.py q1 [q2 ...] [--reps N] [--json out]
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
    from mod_reservoir_spark.pipeline import text as tx
    from pyspark.sql import functions as F

    cur_big = tx._bigram_positions
    cur_tri = tx._trigram_positions
    cur_ngr = tx._ngram_positions

    def pre_big(docs, text_col):
        return (
            cur_big(docs, text_col)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.sum("bf").cast("long").alias("bf"))
        )

    def pre_tri(docs, text_col):
        return (
            cur_tri(docs, text_col)
            .groupBy("doc_id", "w1", "w2", "w3")
            .agg(F.sum("tf3").cast("long").alias("tf3"))
        )

    def pre_ngr(docs, text_col, k, pad_short=False):
        cols = [f"w{i}" for i in range(1, k + 1)]
        return (
            cur_ngr(docs, text_col, k, pad_short)
            .groupBy("doc_id", *cols)
            .agg(F.sum("tf").cast("long").alias("tf"))
        )

    def set_arm(pre: bool):
        tx._bigram_positions = pre_big if pre else cur_big
        tx._trigram_positions = pre_tri if pre else cur_tri
        tx._ngram_positions = pre_ngr if pre else cur_ngr

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_preagg", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = qs[name]
        for pre in (True, False):  # warm both shapes at tiny SF
            set_arm(pre)
            if os.path.isdir(WARMUP_SF_DIR):
                fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark.catalog.clearCache()
        runs = {"pre": [], "cur": []}
        for _r in range(args.reps):
            for pre in (True, False):
                set_arm(pre)
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs["pre" if pre else "cur"].append(
                    round(time.time() - t0, 3)
                )
                spark.catalog.clearCache()
        out[name] = {
            "pre_min": min(runs["pre"]),
            "cur_min": min(runs["cur"]),
            "pre": runs["pre"],
            "cur": runs["cur"],
        }
        print(name, json.dumps(out[name]))
    set_arm(False)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
