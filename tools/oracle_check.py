"""Driver simulator: run every queries() entry on Spark and its
oracle_sql() on DuckDB at the same sf_dir, compare row count + column
names + order-insensitive value hash. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

Exit code 0 iff every checked query matches.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def type_tag(t: pa.DataType) -> str:
    """Coarse Arrow type class. Hashing includes this tag so a DuckDB
    HUGEINT/DECIMAL (arrow decimal128) never hash-matches a Spark BIGINT
    (arrow int64) — mirroring the driver's typed comparison, which the old
    str()-based checker hid (8 silent round-1 failures)."""
    if pa.types.is_boolean(t):
        return "b"
    if pa.types.is_integer(t):
        return "i"
    if pa.types.is_floating(t):
        return "f"
    if pa.types.is_decimal(t):
        return "d"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "t"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "s"
    return "o"


def norm_cell(v, tag: str = "o") -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f"{tag}:true" if v else f"{tag}:false"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{tag}:{int(v)}"
        return f"{tag}:{v!r}"
    return f"{tag}:{v}"


def arrow_rows(table: pa.Table) -> tuple[list[str], list[tuple], list[str]]:
    """(column names, python rows, per-column type tags) from an Arrow table."""
    cols = table.column_names
    tags = [type_tag(f.type) for f in table.schema]
    pylists = [c.to_pylist() for c in table.columns]
    rows = list(zip(*pylists)) if cols else []
    return cols, rows, tags


def table_hash(rows: list[tuple], cols: list[str], tags: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i], tags[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from mod_reservoir_spark.session import get_spark

    spark = get_spark("oracle_check", cpus=8, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if os.environ.get("ORACLE_CHECK_RETIRED") == "1":
        # include the rotated-out contract rows (retired_queries) so
        # one sweep covers the whole historical surface
        qs = {**qs, **entry_mod.retired_queries()}
        oracles = {**oracles, **entry_mod.retired_oracle_sql()}
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}")
            return 2
    failures, no_oracle, checked = [], [], 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols, srows, stags = arrow_rows(sdf.toArrow())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:400]}")
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            no_oracle.append(name)
            print(f"rows  {name}: {len(srows)} rows, no oracle ({spark_t:.1f}s)")
            continue
        try:
            dcols, drows, dtags = arrow_rows(con.execute(oracles[name]).arrow())
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:400]}")
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            sh = table_hash(srows, scols, stags)
            dh = table_hash(drows, dcols, dtags)
            if sh != dh:
                problems.append(f"hash spark={sh} duck={dh}")
                # show a few differing lines for debugging
                so = sorted(range(len(scols)), key=lambda i: scols[i])
                do = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = {"\x01".join(norm_cell(r[i], stags[i]) for i in so)
                        for r in srows}
                dset = {"\x01".join(norm_cell(r[i], dtags[i]) for i in do)
                        for r in drows}
                for x in list(sset - dset)[:3]:
                    print(f"      spark-only: {x[:200]!r}")
                for x in list(dset - sset)[:3]:
                    print(f"      duck-only:  {x[:200]!r}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(srows)} rows ({spark_t:.1f}s)")

    print(
        f"\n{checked - len(failures) - len(no_oracle)} ok, "
        f"{len(no_oracle)} rows-only, {len(failures)} failed"
        f" (of {checked} checked)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
