"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation,
no driver collect, no result pruning). Every query is timed
$SPARK_GRAFT_REPEATS times (default 3) and the MEDIAN is reported —
this box shows up to 1.5x run-to-run variance, so single-shot numbers
are not comparable across rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "cql_filter",
    "distinct_on",
    "keyset_page",
    "three_table_join",
    "cluster_histogram",
    "cluster_cc",
    "token_stats",
    "quality",
    "fingerprint",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_topk",
    "embedding_lsh_topk",
    "sessionize",
    "hourly_rollup",
    "topk_per_type",
]


WARMUP_SF_DIR = "/root/testdata/sf0.001"


def band_check(
    timings: dict[str, float],
    total: float,
    sf: str,
    path: str | None = None,
) -> dict | None:
    """Compare this draw against BENCH_ADJUDICATED's per-query
    [min, max] bands and report every violation mechanically (VERDICT
    r11 Next #1: the r10 drift and the two above-band r11 rows were
    both HAND-spotted; nobody's job was to notice, so a round of
    adjudication got burned each time).

    The bands are multi-period independent-process spreads (this box's
    cross-period drift is ~1.30× while in-session spread is ~4%, so a
    draw outside the band is either a NEW box period or a code event —
    either way it needs triage, which is exactly what the verdict
    should see without a human diffing JSON). Violations are reported,
    never fatal: a legitimate new box period puts many untouched rows
    on the same side of their bands at once, and that correlated
    pattern IS the box-weather signature (code events move the rows
    the diff touched). Rows not in the artifact (fresh promotions) are
    listed as `no_band` — the band-refresh rule says they get ≥3 fresh
    independent draws folded in the same round their code lands.
    Returns None (and stays out of the sidecar) when the artifact is
    missing or was drawn at a different SF."""
    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_ADJUDICATED.json",
        )
    try:
        with open(path) as f:
            adj = json.load(f)
    except (OSError, ValueError):
        return None
    if float(adj.get("sf", -1)) != float(sf):
        return None
    bands = adj.get("queries", {})
    violations = []
    no_band = []
    for name, drawn in timings.items():
        b = bands.get(name)
        if not b:
            no_band.append(name)
            continue
        if drawn < b["min"] or drawn > b["max"]:
            violations.append(
                {
                    "query": name,
                    "draw": drawn,
                    "band": [b["min"], b["max"]],
                    "median": b["median"],
                    "side": "above" if drawn > b["max"] else "below",
                    "ratio_to_median": round(drawn / b["median"], 2)
                    if b["median"]
                    else None,
                }
            )
    hb = adj.get("headline", {})
    out = {
        "artifact": "BENCH_ADJUDICATED.json",
        "protocol": adj.get("protocol", ""),
        "checked": len(timings) - len(no_band),
        "violations": sorted(
            violations,
            key=lambda v: -(v["ratio_to_median"] or 0),
        ),
        "no_band": sorted(no_band),
    }
    if hb:
        out["headline"] = {
            "draw": total,
            "band": [hb.get("min"), hb.get("max")],
            "in_band": hb.get("min", 0) <= total <= hb.get("max", 1e9),
        }
    # a one-line human summary on stderr (stdout stays the ONE JSON
    # line the driver contract requires)
    n_out = len(violations)
    print(
        f"band_check: {n_out} of {out['checked']} rows outside their "
        f"adjudicated band; {len(no_band)} rows without a band",
        file=sys.stderr,
        flush=True,
    )
    return out


def merge_write_sidecar(path: str, owned: dict) -> dict:
    """Read-modify-write a shared JSON sidecar: refresh the keys this
    writer owns, preserve every key it doesn't. A wholesale rewrite
    from per-round keys destroyed the one-off `adversarial_hub_10m`
    decade measurement once (VERDICT r12 finding #1); any sidecar that
    accumulates hand-recorded entries must go through this. Corrupt or
    missing files start fresh (the owned keys still land)."""
    merged: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except (json.JSONDecodeError, OSError):
            merged = {}
    merged.update(owned)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    return merged


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=int(cpus))
    # retired contract rows stay in the bench: HEADLINE is the stable
    # cross-round comparison basket and three of its members
    # (distinct_on, minhash_signatures, simhash) rotated out of the
    # driver contract in round 5
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}

    # every contract query is timed (regressions in OAI/export paths
    # stay visible); the headline metric sums the HEADLINE subset so
    # it remains comparable round-over-round
    order = HEADLINE + [n for n in qs if n not in HEADLINE]

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    timings: dict[str, float] = {}
    for name in order:
        fn = qs[name]
        # untimed warmup at the smallest SF: populates codegen/JIT and
        # Python-worker caches so the timed run measures steady-state
        # execution (the regime that matters at scale), not one-time
        # compilation of the query shape
        if WARMUP_SF_DIR != sf_dir and os.path.isdir(WARMUP_SF_DIR):
            fn(spark, WARMUP_SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(runs), 3)

    total = round(sum(timings[n] for n in HEADLINE), 3)

    # CC telemetry sidecar (VERDICT r6 "Next #10"): edges/iterations of
    # the clustering runs this bench drove, tracked round-over-round
    # next to the timings. Written beside bench.py, never on stdout —
    # the driver contract is ONE JSON line.
    from mod_reservoir_spark.operators import clustering as cc

    if cc.LAST_RUN_STATS:
        sidecar = {
            "sf": float(sf),
            "repeats": repeats,
            "last_run": {
                k: cc.LAST_RUN_STATS[k]
                for k in ("edges", "iterations", "converged")
            },
            "runs": cc.LAST_RUN_STATS.get("runs", 0),
            "total_iterations": cc.LAST_RUN_STATS.get(
                "total_iterations", 0
            ),
            # worst-case path topology (VERDICT r9 Next #8): the real
            # match-key graphs above are star-shaped (1 iteration), so
            # this row is what actually exercises the O(log diameter)
            # pointer-jumping bound every round — iterations ~log2(n),
            # exact_fixpoint must stay true
            "adversarial": cc.adversarial_cc_telemetry(spark),
            # skewed-hub topology (VERDICT r10 Next #4): one hot
            # match_value shared by 10⁵ records plus background
            # pools — the 100 TB skew risk measured per round; the
            # map-side partial agg collapses the hub key, so
            # hub_fanout/seconds staying ~linear is the all-clear
            "adversarial_hub": cc.hub_cc_telemetry(spark),
        }
        # merge-update, never wholesale rewrite: this sidecar also
        # carries one-off measurements recorded by hand (the r12
        # `adversarial_hub_10m` decade point) — a full rewrite from
        # the per-round keys destroyed it once (VERDICT r12 finding
        # #1). Keys bench owns are refreshed; foreign keys survive.
        merge_write_sidecar(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "CC_TELEMETRY.json",
            ),
            sidecar,
        )

    payload = {
        # queries FIRST, headline metric LAST: the driver keeps only
        # the final ~2000 chars of stdout (r7: BENCH_r07 lost the
        # headline fields from the front of the line), and tail
        # truncation must never eat metric/value/sf
        "queries": timings,
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": float(sf),
    }
    band = band_check(timings, total, sf)
    if band is not None:
        payload["band_check"] = band
    # full artifact beside bench.py, immune to any stdout cap
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
        ),
        "w",
    ) as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, separators=(",", ":")))


if __name__ == "__main__":
    main()
