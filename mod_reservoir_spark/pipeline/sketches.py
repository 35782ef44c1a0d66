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
    # NULLs carry no distinct value and md5(NULL) is NULL, which would
    # emit a (bucket=NULL, r=NULL) register that breaks estimation.
    df = df.filter(F.col(value_col).isNotNull())
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


def cm_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch registers — the frequency sibling of
    :func:`hll_registers`, same determinism contract: cell indices are
    md5-derived (seeded per hash row), so the register table is
    byte-identical across engines and hash-checkable. Answers
    "how often did value X appear" within ε = e/width of the input
    size (one-sided: never under-counts), in groups × depth × width
    bounded rows regardless of input size.

    Output: (group…, d, cell, c). Merge registers from DISJOINT scans
    with :func:`cm_merge` (counts ADD — unlike HLL max-merge, merging
    overlapping scans double-counts)."""
    if 65536 % width:
        raise ValueError(f"width={width} must divide 65536")
    df = df.filter(F.col(value_col).isNotNull())
    entries = [
        F.struct(
            F.lit(d).alias("d"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"{d}:"),
                                F.col(value_col).cast("string"),
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("long")
                % width
            ).alias("cell"),
        )
        for d in range(depth)
    ]
    return (
        df.select(*group_cols, F.explode(F.array(*entries)).alias("dc"))
        .select(*group_cols, "dc.d", "dc.cell")
        .groupBy(*group_cols, "d", "cell")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cm_merge(*register_dfs: DataFrame) -> DataFrame:
    """Combine register tables from DISJOINT scans: counts add."""
    out = register_dfs[0]
    for d in register_dfs[1:]:
        out = out.unionByName(d)
    keys = [c for c in out.columns if c != "c"]
    return out.groupBy(*keys).agg(F.sum("c").cast("long").alias("c"))


def cm_estimate(
    registers: list[tuple[int, int, int]],
    value,
    depth: int = 4,
    width: int = 256,
) -> int:
    """Point frequency estimate from (d, cell, c) rows of ONE group:
    min over the value's cells (the classic CM upper bound)."""
    import hashlib

    table: dict[tuple[int, int], int] = {
        (d, cell): c for d, cell, c in registers
    }
    est = None
    for d in range(depth):
        h = hashlib.md5(f"{d}:{value}".encode()).hexdigest()
        cell = int(h[:4], 16) % width
        c = table.get((d, cell), 0)
        est = c if est is None else min(est, c)
    return int(est or 0)


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
