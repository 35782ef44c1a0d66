"""Derive a larger scale factor from driver testdata for headroom runs.

The driver generates sf0.001/sf0.01/sf0.1; the 100× scale claims in
SCALE.md deserve at least one measurement ABOVE the bench's sf0.1, so
this tool replicates an existing sf directory N× with key shifts —
distribution-faithful per table:

- region/nation: fixed dimensions, copied as-is (like TPC-H).
- customer/supplier/part/orders/lineitem/events: each replica shifts
  every key column (custkey, orderkey, partkey, suppkey, event_id,
  user_id) by replica × (max_key + 1), so foreign-key joins land on
  the replica's own rows and join fan-outs scale linearly.
- documents: doc_id shifted; replicas > 0 suffix every token with
  the replica number so replicas are NOT near-duplicates of each
  other — exact replication would make every doc a 10-way dup group
  and blow pair-query candidate counts up combinatorially (k² per
  group), which would measure an artifact, not scaling. Within one
  replica the original near-dup structure is preserved, so pair
  counts scale ~linearly as they would in a real 10× corpus.
- embeddings: vec_id shifted; replicas rotate the vector elements by
  the replica index (norm-preserving; a random vector has low cosine
  to its rotation, so no artificial cross-replica ANN matches).

Usage: python tools/make_scaled_sf.py SRC_DIR DEST_DIR MULTIPLIER
e.g.:  python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]
# each key column shifts within its own domain so FK joins stay intact
DOMAIN = {
    "c_custkey": "custkey", "o_custkey": "custkey",
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "event_id": "event_id", "user_id": "user_id",
    "doc_id": "doc_id", "vec_id": "vec_id",
}


def scale(spark, src: str, dest: str, mult: int) -> None:
    os.makedirs(dest, exist_ok=True)
    for t in COPY:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dest}/{t}.parquet")
    # per-domain offsets = max+1 over the domain's home table
    offsets: dict[str, int] = {}
    home = {
        "custkey": ("customer", "c_custkey"),
        "orderkey": ("orders", "o_orderkey"),
        "partkey": ("part", "p_partkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
        "doc_id": ("documents", "doc_id"),
        "vec_id": ("embeddings", "vec_id"),
    }
    for dom, (table, col) in home.items():
        offsets[dom] = (
            spark.read.parquet(f"{src}/{table}.parquet")
            .agg(F.max(col))
            .collect()[0][0]
            + 1
        )

    for t, keys in KEYS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t == "events":
            # driver stores TIMESTAMP(NANOS) (read here as NTZ micros);
            # write plain TIMESTAMP so the bench session reads it as a
            # timestamp without the nanos special-case
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        parts = []
        for r in range(mult):
            rep = df
            for k in keys:
                rep = rep.withColumn(
                    k, (F.col(k) + F.lit(r * offsets[DOMAIN[k]])).cast("long")
                )
            if t == "documents" and r > 0:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"_{r}")),
                        ),
                        " ",
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and r > 0:
                n = F.size("embedding")
                # rotate by r mod dim; multipliers beyond the vector
                # dimension wrap, which would REPEAT a transform and
                # plant exact-duplicate vectors across replicas (an
                # ANN artifact) — so odd wraps also negate (norm-
                # preserving, cosine(v,-v) = -1): dim rotations x 2
                # signs = 2*dim distinct transforms
                k = F.lit(r) % n
                rot = F.when(k == 0, F.col("embedding")).otherwise(
                    F.concat(
                        F.slice(F.col("embedding"), k + 1, n - k),
                        F.slice(F.col("embedding"), 1, k),
                    )
                )
                rep = rep.withColumn(
                    "embedding",
                    F.when(
                        (F.lit(r) / n).cast("int") % 2 == 1,
                        F.transform(rot, lambda x: -x),
                    ).otherwise(rot),
                )
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
        print(f"{t}: {df.count()} -> {mult}x", flush=True)


if __name__ == "__main__":
    src, dest, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from mod_reservoir_spark.session import get_spark

    spark = get_spark("make_scaled_sf", cpus="16", shuffle_partitions=32)
    scale(spark, src, dest, mult)
    print("done:", dest)
