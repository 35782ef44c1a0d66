"""Deterministic sketches: HyperLogLog (distinct count), Count-Min
(frequency), Bloom filter (membership).

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
    bucket, rank = hll_bucket_rank(value_col, m)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").cast("long").alias("r"))
    )


def hll_bucket_rank(value_col: str, m: int):
    """The (bucket, rank) column pair of one value — THE HLL register
    derivation, exposed so fused multi-sketch queries reuse the exact
    expressions `hll_registers` aggregates."""
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m
    val = F.conv(F.substring(h, 5, 13), 16, 10).cast("long")
    rank = F.when(val == 0, F.lit(HLL_BITS + 1)).otherwise(
        F.lit(HLL_BITS + 1) - F.length(F.bin(val))
    )
    return bucket, rank


def cm_cell(value_col: str, d: int, width: int):
    """The depth-``d`` cell index of one value — THE Count-Min cell
    derivation (seeded md5), shared with fused multi-sketch queries."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{d}:"), F.col(value_col).cast("string"))
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % width
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
            cm_cell(value_col, d, width).alias("cell"),
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


def bloom_registers(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    n_hashes: int = 4,
    m_bits: int = 4096,
) -> DataFrame:
    """Bloom filter as a register table — the set-MEMBERSHIP sibling of
    :func:`hll_registers` (distinct count) and :func:`cm_registers`
    (frequency), same determinism contract: bit indices are md5-derived
    (seeded per hash), so the set-bit table is byte-identical across
    engines, and registers are plain rows a warehouse stores, merges
    and queries without rescanning the corpus.

    The canonical 100 TB use is the "have we seen this URL/doc id"
    prefilter: build the filter once over the corpus (bounded output —
    at most groups × m_bits rows no matter the input), broadcast it,
    and drop the vast majority of non-members before an expensive join
    or lookup; false positives (the only error mode) just pass a few
    extra rows through to the exact check.

    Output: (group…, bit) — the DISTINCT set bits. Merge filters built
    over any scans (disjoint or overlapping) with
    :func:`bloom_merge` — bitwise OR is just union+distinct.
    """
    if 65536 % m_bits:
        raise ValueError(f"m_bits={m_bits} must divide 65536")
    df = df.filter(F.col(value_col).isNotNull())
    return df.select(
        *group_cols,
        F.explode(_bloom_bit_array(value_col, n_hashes, m_bits)).alias(
            "bit"
        ),
    ).distinct()


def _bloom_bit_array(value_col: str, n_hashes: int, m_bits: int):
    """The n_hashes md5-seeded bit indices of a value — THE bit
    derivation, shared by registers and prefilter so the two can never
    drift into disjoint bit spaces (bloom_might_contain mirrors it
    driver-side)."""
    return F.array(
        *[
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
                % m_bits
            )
            for d in range(n_hashes)
        ]
    )


def bloom_merge(*register_dfs: DataFrame) -> DataFrame:
    """OR filters together: union + distinct (idempotent, overlap-safe)."""
    out = register_dfs[0]
    for d in register_dfs[1:]:
        out = out.unionByName(d)
    return out.distinct()


def bloom_prefilter(
    candidates: DataFrame,
    value_col: str,
    registers: DataFrame,
    n_hashes: int = 4,
    m_bits: int = 4096,
) -> DataFrame:
    """Rows of ``candidates`` that MIGHT be in the filter (all their
    bits set — definite non-members are dropped, the Bloom guarantee).

    Distributed shape: each candidate's distinct bit set explodes to
    rows, inner-joins the (tiny, broadcast) register table, and a
    candidate passes iff every required bit matched — a broadcast hash
    join plus one combinable count, never a per-row O(m) scan.

    ``n_hashes``/``m_bits`` MUST match the values the registers were
    built with — a mismatch silently degrades to near-zero matches
    (bit indices land in a different space). Store the parameters next
    to the persisted register table.

    Duplicate candidate rows pass or fail independently (each row gets
    a unique tag before the explode — without it, grouping by the
    candidate columns would merge duplicates and the doubled match
    count would FAIL the all-bits check, a false negative the Bloom
    contract forbids).
    """
    bits = F.array_distinct(_bloom_bit_array(value_col, n_hashes, m_bits))
    with_bits = (
        candidates.withColumn("_row", F.monotonically_increasing_id())
        .withColumn("_bits", bits)
        .withColumn("_need", F.size("_bits"))
    )
    matched = (
        with_bits.select(
            *candidates.columns,
            "_row",
            "_need",
            F.explode("_bits").alias("bit"),
        )
        .join(F.broadcast(registers.select("bit").distinct()), "bit")
        .groupBy(*candidates.columns, "_row", "_need")
        .agg(F.count("*").alias("_got"))
        .filter(F.col("_got") == F.col("_need"))
        .select(*candidates.columns)
    )
    return matched


def bloom_might_contain(
    bits: set[int] | list[int], value, n_hashes: int = 4, m_bits: int = 4096
) -> bool:
    """Driver-side membership test against one group's set-bit rows."""
    import hashlib

    bitset = set(bits)
    for d in range(n_hashes):
        h = hashlib.md5(f"{d}:{value}".encode()).hexdigest()
        if int(h[:4], 16) % m_bits not in bitset:
            return False
    return True


def bloom_cardinality(
    bits: set[int] | list[int], n_hashes: int = 4, m_bits: int = 4096
) -> float:
    """Swamidass-Baldi estimate of the number of inserted distinct
    values from the set-bit count: -m/k · ln(1 - X/m)."""
    x = len(set(bits))
    if x >= m_bits:
        return float("inf")
    return -(m_bits / n_hashes) * math.log(1.0 - x / m_bits)


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
