"""Interleaved same-session A/B for the r13 batch-6 edits:
winnow_pairs (sizes-join elimination), leakage_safe_split (narrow
split projection), bm25_search (one-pass tokenize). NEW = HEAD code;
OLD = the pre-edit shapes, reconstructed here and monkeypatched in —
alternated per repeat inside one Spark session so box noise hits both
arms (guide §1).

Usage: python tools/ab_r13b.py [--reps N] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def old_winnow_pairs(docs, text_col="text", k=5, w=4, max_block_df=30,
                     threshold_ppm=400000):
    from pyspark.sql import functions as F
    from mod_reservoir_spark.pipeline.text import _winnow_windows, ppm

    fp_arrays = (
        _winnow_windows(docs, text_col, k, w)
        .select("doc_id", F.array_distinct("wins").alias("fps"))
        .persist()
    )
    fp_rows = fp_arrays.select("doc_id", F.explode("fps").alias("fp"))
    sizes = fp_arrays.select("doc_id", F.size("fps").alias("n_fp"))
    blocking = (
        fp_rows.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= max_block_df))
        .select("fp")
    )
    blocked = fp_rows.join(blocking, "fp")
    candidates = (
        blocked.alias("a")
        .join(
            blocked.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    shared = (
        candidates.join(
            fp_arrays.select(
                F.col("doc_id").alias("doc_a"), F.col("fps").alias("fps_a")
            ),
            "doc_a",
        )
        .join(
            fp_arrays.select(
                F.col("doc_id").alias("doc_b"), F.col("fps").alias("fps_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("fps_a", "fps_b")).alias("n_shared"),
        )
    )
    return (
        shared.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a")
            ),
            "doc_a",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b")
            ),
            "doc_b",
        )
        .withColumn(
            "overlap_ppm",
            ppm(F.col("n_shared"), F.least(F.col("n_a"), F.col("n_b"))),
        )
        .filter(F.col("overlap_ppm") >= threshold_ppm)
        .select("doc_a", "doc_b", "n_shared", "overlap_ppm")
    )


def old_leakage_safe_split(docs, pairs, fracs=None, id_col="doc_id",
                           salt="split"):
    from pyspark.sql import functions as F
    from mod_reservoir_spark.pipeline.dedup import near_dedup_keep
    from mod_reservoir_spark.pipeline.sampling import split_assign

    groups = near_dedup_keep(
        docs.select(F.col(id_col).alias("doc_id")).filter(
            F.col("doc_id").isNotNull()
        ),
        pairs=pairs,
    ).select(F.col("doc_id").alias(id_col), "keep_id")
    assigned = split_assign(
        groups.select(F.col("keep_id").alias(id_col)).distinct(),
        fracs,
        id_col,
        salt,
    ).select(F.col(id_col).alias("keep_id"), "split")
    return groups.join(assigned, "keep_id").select(id_col, "keep_id", "split")


def old_bm25_search(docs, query, text_col="text", k=10, k1=1.2, b=0.75):
    from pyspark.sql import functions as F
    from mod_reservoir_spark.pipeline.text import tokens

    qterms = sorted({t for t in query.lower().split() if t})
    if not qterms:
        raise ValueError("bm25_search: query has no tokens")
    qarr = F.array(*[F.lit(t) for t in qterms])
    toks = tokens(text_col)
    t = docs.select("doc_id", toks.alias("_toks"))
    stats = t.agg(
        F.count("*").cast("long").alias("_n"),
        (F.sum(F.coalesce(F.size("_toks"), F.lit(0))) / F.count("*")).alias(
            "_avgdl"
        ),
    )
    posting = (
        t.select(
            "doc_id",
            F.coalesce(F.size("_toks"), F.lit(0)).cast("long").alias("dl"),
            F.explode(
                F.filter("_toks", lambda x: F.array_contains(qarr, x))
            ).alias("term"),
        )
        .groupBy("doc_id", "term", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
        .persist()
    )
    df_tbl = posting.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    idf = F.log(
        (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + F.lit(k1) * (
        1.0 - b + F.lit(b) * F.col("dl") / F.col("_avgdl")
    )
    contrib = idf * F.col("tf") * (k1 + 1.0) / denom
    return (
        posting.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "dl")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(F.sum(contrib) * 1000000).cast("long").alias("score_e6"),
        )
        .orderBy(F.col("score_e6").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "dl", "n_terms", "score_e6")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark
    from mod_reservoir_spark.pipeline import sampling as smp
    from mod_reservoir_spark.pipeline import text as tx

    new_impls = {
        "winnow_pairs": (tx, "winnow_pairs", tx.winnow_pairs),
        "leakage_safe_split": (
            smp, "leakage_safe_split", smp.leakage_safe_split
        ),
        "bm25_search": (tx, "bm25_search", tx.bm25_search),
    }
    old_impls = {
        "winnow_pairs": old_winnow_pairs,
        "leakage_safe_split": old_leakage_safe_split,
        "bm25_search": old_bm25_search,
    }

    def set_arm(new: bool):
        for key, (mod, attr, new_fn) in new_impls.items():
            setattr(mod, attr, new_fn if new else old_impls[key])

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_r13b", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    out: dict[str, dict] = {}
    for name in ("winnow_pairs", "leakage_safe_split", "bm25_search"):
        fn = qs[name]
        for new in (True, False):
            set_arm(new)
            if os.path.isdir(WARMUP_SF_DIR):
                fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                spark.catalog.clearCache()
        runs = {"new": [], "old": []}
        for _r in range(args.reps):
            # alternate the within-cycle ORDER: a warming session makes
            # the second run of each cycle systematically faster, so a
            # fixed order biases against whichever arm goes first
            order = (True, False) if _r % 2 == 0 else (False, True)
            for new in order:
                set_arm(new)
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs["new" if new else "old"].append(
                    round(time.time() - t0, 3)
                )
                spark.catalog.clearCache()
        out[name] = {
            "new_min": min(runs["new"]),
            "old_min": min(runs["old"]),
            "new": runs["new"],
            "old": runs["old"],
        }
        print(name, json.dumps(out[name]))
    set_arm(True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
