"""Interleaved same-session A/B of CURRENT vs a GIT-REVISION module:
loads the old version of a module file from git into a shadow module
and alternates named functions between the two implementations per
repeat (order-balanced) inside one Spark session.

Usage:
    python tools/ab_gitmod.py --module mod_reservoir_spark.pipeline.dedup \
        --rev HEAD --funcs minhash_lsh_pairs,near_contamination \
        q1 [q2 ...] [--reps N] [--json out]
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def load_git_module(module: str, rev: str):
    path = module.replace(".", "/") + ".py"
    src = subprocess.run(
        ["git", "show", f"{rev}:{path}"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    fd, tmp = tempfile.mkstemp(suffix=".py", prefix="abold_")
    with os.fdopen(fd, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("_ab_old_mod", tmp)
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)
    return old


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--module", required=True)
    ap.add_argument("--rev", default="HEAD")
    ap.add_argument("--funcs", required=True)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark

    cur_mod = importlib.import_module(args.module)
    old_mod = load_git_module(args.module, args.rev)
    funcs = args.funcs.split(",")
    cur_fns = {f: getattr(cur_mod, f) for f in funcs}
    old_fns = {f: getattr(old_mod, f) for f in funcs}

    def set_arm(new: bool):
        for f in funcs:
            setattr(cur_mod, f, cur_fns[f] if new else old_fns[f])

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab_gitmod", cpus=cpus, shuffle_partitions=int(cpus))
    qs = {**entry_mod.retired_queries(), **entry_mod.queries()}
    out: dict[str, dict] = {}
    for name in args.queries:
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
