"""The r8 median-and-spread adjudication protocol (VERDICT r10 Next
#1): run bench.py N times as INDEPENDENT processes (fresh JVM each —
same-process repeats share codegen caches and understate variance),
then write one artifact carrying, per query and for the headline sum:
the median, the min-max spread, and every raw run — so a docs claim
can cite median AND spread instead of a single draw on a box with
documented 1.5x run-to-run variance.

Usage:
    python tools/bench_median.py [N] [out.json] [--fold --period NAME]
Defaults: N=3, out=BENCH_ADJUDICATED.json (repo root). bench.py's own
env knobs ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS, $SPARK_GRAFT_REPEATS)
apply to each run unchanged.

``--fold``: instead of overwriting the artifact, append this session's
draws as a NEW box period and recompute every query's median/min/max
over ALL recorded runs — the band-refresh rule (VERDICT r11 Next #1):
a row whose code changes gets >=3 fresh independent draws folded into
its band the same round, and a fresh promotion gets its first band
from the fold. Queries new to the contract enter with only the fresh
runs; queries that left it keep their historical band (they stay in
the retired bench basket). ``--period`` names the period (default
``p<k>`` for the next k).

**Band-refresh integrity rule (VERDICT r13 Next #9):** a fold REFUSES
to absorb any query whose fresh median exceeds 1.5× its existing band
median — that is the shape of a code regression, and folding it would
silently widen the band so the round's own band_check can never flag
it again (the r13 kn_logprob lesson: 8.3/13.6 s draws folded over a
5.3 s band). To fold such a row anyway, pass
``--adjudicated q1,q2,...`` with the queries whose slowdown has an
explicit pre-vs-post-code A/B verdict; the artifact records the
adjudication note per query/period so the next verdict can audit it.
``--purge q1,q2,...`` drops the named queries' recorded runs/bands
entirely before folding (used to rebuild a band from post-fix draws
only after a regression was reverted or fixed).
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


def fold(
    dest: str,
    runs: list[dict],
    period: str | None,
    adjudicated: set[str] | None = None,
    purge: set[str] | None = None,
) -> dict:
    """Merge this session's draws into an existing artifact as a new
    period; per-query stats recomputed over all runs ever recorded.

    Integrity rule (module docstring): a query whose fresh median is
    >1.5× its existing band median never folds silently — it needs an
    explicit ``adjudicated`` entry (recorded in the artifact), else the
    fold aborts before writing anything."""
    adjudicated = adjudicated or set()
    with open(dest) as f:
        art = json.load(f)
    if float(art.get("sf", -1)) != float(runs[0]["sf"]):
        raise RuntimeError(
            f"artifact sf {art.get('sf')} != run sf {runs[0]['sf']} — "
            "refusing to fold draws across scale factors"
        )
    periods = art.setdefault("periods", {})
    if period is None:
        k = 1
        while f"p{k}" in periods:
            k += 1
        period = f"p{k}"
    if period in periods:
        raise RuntimeError(f"period {period!r} already recorded")
    queries = art.setdefault("queries", {})
    for q in purge or set():
        queries.pop(q, None)
        art.setdefault("purged", {}).setdefault(q, []).append(period)
    # integrity check BEFORE any mutation: collect every query whose
    # fresh median would regress its band >1.5× without an adjudication
    fresh_names = set().union(*(r["queries"] for r in runs))
    offenders = []
    for q in sorted(fresh_names):
        old = queries.get(q)
        if not old or not old.get("median"):
            continue
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        fm = statistics.median(vals)
        if fm > 1.5 * old["median"] and q not in adjudicated:
            offenders.append(
                f"{q}: fresh median {round(fm, 3)} vs band median "
                f"{old['median']} ({round(fm / old['median'], 2)}x)"
            )
    if offenders:
        raise RuntimeError(
            "fold refused — these rows' fresh draws are >1.5x their "
            "adjudicated band median, which is the shape of a code "
            "regression; record a pre-vs-post-code A/B verdict and "
            "re-run with --adjudicated (VERDICT r13 Next #9):\n  "
            + "\n  ".join(offenders)
        )
    periods[period] = [r["value"] for r in runs]
    for q in sorted(adjudicated):
        art.setdefault("adjudications", {}).setdefault(q, []).append(
            period
        )
    for q in fresh_names:
        vals = [r["queries"][q] for r in runs if q in r["queries"]]
        entry = queries.setdefault(q, {"runs": []})
        entry["runs"] = entry.get("runs", []) + vals
        entry["median"] = round(statistics.median(entry["runs"]), 3)
        entry["min"] = min(entry["runs"])
        entry["max"] = max(entry["runs"])
    hl = art.setdefault("headline", {"runs": []})
    hl["runs"] = hl.get("runs", []) + [r["value"] for r in runs]
    hl["median"] = round(statistics.median(hl["runs"]), 3)
    hl["min"] = min(hl["runs"])
    hl["max"] = max(hl["runs"])
    n_periods = len(periods)
    n_runs = len(hl["runs"])
    art["protocol"] = (
        f"{n_runs} independent bench.py processes across "
        f"{n_periods} box periods (tools/bench_median.py, folded) - "
        "per-query median + spread over all draws"
    )
    return art


def main() -> int:
    argv = sys.argv[1:]
    do_fold = "--fold" in argv
    period = None
    adjudicated: set[str] = set()
    purge: set[str] = set()
    if "--period" in argv:
        i = argv.index("--period")
        period = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--adjudicated" in argv:
        i = argv.index("--adjudicated")
        adjudicated = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    if "--purge" in argv:
        i = argv.index("--purge")
        purge = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 3
    dest = args[1] if len(args) > 1 else os.path.join(
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
    if do_fold:
        artifact = fold(dest, runs, period, adjudicated, purge)
        with open(dest, "w") as f:
            json.dump(artifact, f, indent=1)
        print(
            f"folded {n} fresh draws into {dest}: headline median "
            f"{artifact['headline']['median']} s over "
            f"{len(artifact['headline']['runs'])} total runs, spread "
            f"[{artifact['headline']['min']}, "
            f"{artifact['headline']['max']}]"
        )
        return 0
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
