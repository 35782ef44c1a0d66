"""Deterministic distinct-count sketches (HyperLogLog).

Spark's ``approx_count_distinct`` and DuckDB's are different HLL
implementations, so their estimates can't be cross-checked. This
module builds the registers EXPLICITLY from md5-derived integers —
bucket = 16 md5 bits mod m, rank = leading-zero count of the next 52
bits — entirely in JVM expressions, so (a) the register table is
byte-identical across engines (the DuckDB oracle replicates it and
the driver hash-checks it), and (b) registers are plain rows a
warehouse can store, MERGE (element-wise max) and re-estimate without
rescanning the corpus — the sketch lifecycle a 100 TB pipeline needs
for per-partition distinct counts that roll up.

Scale shape: one map-side-combinable groupBy((group, bucket), max) —
the shuffle carries at most groups × m tiny rows regardless of input
size. Estimation runs on the collected registers (≤ m per group) with
the standard HLL bias corrections (Flajolet et al. 2007).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

HLL_BITS = 52  # bits of md5 used for the rank geometric


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    m: int = 512,
) -> DataFrame:
    """(group…, bucket, r) register rows; insertion-idempotent (no
    pre-distinct needed — duplicates land on the same register and
    max() absorbs them). ``m`` must divide 2^16 (bucket uniformity)."""
    if 65536 % m:
        raise ValueError(f"m={m} must divide 65536")
    h = F.md5(F.col(value_col).cast("string"))
    bucket = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m).alias(
        "bucket"
    )
    val = F.conv(F.substring(h, 5, 13), 16, 10).cast("long")
    rank = F.when(val == 0, F.lit(HLL_BITS + 1)).otherwise(
        F.lit(HLL_BITS + 1) - F.length(F.bin(val))
    )
    return (
        df.select(*group_cols, bucket, rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").cast("long").alias("r"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Union register tables from disjoint scans (or overlapping — HLL
    merge is idempotent) into one: element-wise max per register."""
    out = register_dfs[0]
    for d in register_dfs[1:]:
        out = out.unionByName(d)
    keys = [c for c in out.columns if c != "r"]
    return out.groupBy(*keys).agg(F.max("r").cast("long").alias("r"))


def hll_estimate(registers: list[tuple[int, int]], m: int = 512) -> float:
    """Standard HLL estimate from (bucket, r) rows of ONE group —
    alpha·m²/Σ2^-r with the small-range (linear counting) and
    empty-register corrections."""
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = [0] * m
    for bucket, r in registers:
        regs[bucket] = max(regs[bucket], r)
    est = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est
