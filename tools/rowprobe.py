"""Per-row headroom probe: run named queries() rows at one or more
sf dirs, timing the FIRST call (cold — includes any one-time state
build the harness caches per sf_dir) and the SECOND call (steady /
serving) of each, the protocol SCALE.md's new-row headroom tables use
(r8/r9). Complements tools/headroom.py (fixed dedup/ANN family).

Usage:
    python tools/rowprobe.py QUERY[,QUERY...] SF_DIR [SF_DIR ...]
e.g.:
    python tools/rowprobe.py ngram_logprob,curate_stream /tmp/sf1 /tmp/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    names = sys.argv[1].split(",")
    sf_dirs = sys.argv[2:]

    import __spark_entry__ as em
    from mod_reservoir_spark.session import get_spark

    # the BENCH session config (8g driver unless SPARK_GRAFT_DRIVER_MEM
    # says otherwise) so probe cells compare against bench rows
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("rowprobe", cpus=cpus, shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**em.retired_queries(), **em.queries()}
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(
            f"unknown query name(s): {', '.join(unknown)}\n"
            f"valid names: {', '.join(sorted(qs))}"
        )
        return 2
    runs = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    out: dict[str, dict[str, list[float]]] = {}
    for sf in sf_dirs:
        for name in names:
            fn = qs[name]
            times = []
            for run in range(runs):
                t0 = time.time()
                # noop sink, NOT count(): a bare count() lets Catalyst
                # prune unused aggregate expressions and with them the
                # scoring joins (unique-keyed left joins under a row
                # count are eliminable), so count-based timings can
                # measure a fraction of the plan — bench.py's forcing
                # discipline
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 2)
                times.append(dt)
                print(f"{name} @ {sf} run{run}: {dt}s", flush=True)
            out.setdefault(name, {})[sf] = times
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
