"""Second-decade headroom probe (VERDICT r4 #5): run the expensive
dedup/ANN family at sf0.1 / sf1 / sf3 (1× / 10× / 30× rows) with the
adaptive knobs (auto_planes, auto_clusters) actually exercised, and
print per-query times + ratios for SCALE.md.

Usage:
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf3 30
    python tools/headroom.py [sf_dir ...]     # default: the three above
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 2  # best-of


def queries():
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    from mod_reservoir_spark.pipeline import similarity as sim

    def lsh_self_auto(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return sim.lsh_topk_distributed(
            emb, emb, k=3, n_planes=sim.auto_planes(emb.count()),
            n_tables=4,
        )

    def semantic_auto(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return sim.semantic_dedup(emb, n_clusters="auto")

    _codes_cache: dict[str, str] = {}

    def quantized_topk(spark, sf):
        import tempfile

        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        path = _codes_cache.get(sf)
        if path is None:
            path = tempfile.mkdtemp(prefix="hr_codes_") + "/codes"
            sim.quantize_embeddings(emb).write.parquet(path)
            _codes_cache[sf] = path
        return sim.lsh_topk_quantized(
            spark.read.parquet(path),
            emb.filter(F.col("vec_id") % 50 == 0),
            k=5, n_planes="auto", n_tables=4,
        )

    qs = em.queries()
    return {
        "near_dedup_keep": qs["near_dedup_keep"],
        "minhash_lsh_pairs": qs["minhash_lsh_pairs"],
        "winnow_pairs": qs["winnow_pairs"],
        "minhash_incremental": qs["minhash_incremental"],
        "embedding_lsh_self_auto": lsh_self_auto,
        "semantic_dedup_auto": semantic_auto,
        "lsh_topk_quantized": quantized_topk,
        "curate_funnel": qs["curate_funnel"],
    }


def main() -> None:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf3"]
    from mod_reservoir_spark.session import get_spark

    spark = get_spark("headroom", cpus=32, shuffle_partitions=32)
    out: dict[str, dict[str, float]] = {}
    for name, fn in queries().items():
        out[name] = {}
        for sf in sfs:
            best = None
            for _ in range(RUNS):
                t0 = time.time()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                spark.catalog.clearCache()
            out[name][sf] = round(best, 2)
            print(f"{name} @ {sf}: {out[name][sf]}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
