"""Scale-adaptive input spreading for compute-heavy narrow operators.

The bench corpora arrive as one small parquet file with a single row
group, so every scan is ONE input split: a narrow operator whose cost
is per-row compute (md5 shingles, n-gram window expansion, tokenize +
regex) serializes on one core while the other 31 idle. That is the
"one huge unsplittable file" input-skew case of the optimization
guide (§2.5): fix it by repartitioning right after the read, BEFORE
the heavy per-row work, so the expansion runs on every core.

The gate keeps this strictly scale-adaptive: when the input already
carries at least ``defaultParallelism`` partitions — any real
multi-file/multi-split table, i.e. always at production scale — the
frame is returned unchanged and no shuffle is added. The shuffle this
adds at bench scale moves only the raw input bytes (kilobytes), and
round-robin repartition is retry-deterministic (Spark sorts before
round-robin distribution since SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_input(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` across ``defaultParallelism``
    partitions iff its compiled plan has fewer — the guard that turns
    a single-split scan into a parallel stage without ever touching a
    well-partitioned input.

    Call this only on exchange-free inputs (scans, checkpointed
    frames, narrow projections/filters over them): the gate reads the
    partition count off the compiled RDD, which is free for those
    plans, while under AQE a plan containing exchanges may execute
    query stages just to answer the question.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # unknown/unsupported plan shape: leave as-is
        return df
    if n == 0 or n >= target:
        return df
    return df.repartition(target)
