"""Driver-contract sanity: queries()/oracle_sql() stay consistent and a
sample of oracle comparisons passes at sf0.001 (the full sweep is
tools/oracle_check.py)."""

import duckdb
import pytest

import __spark_entry__ as em
from tools.oracle_check import TABLES, arrow_rows, table_hash

SF = "/root/testdata/sf0.001"

SAMPLE = [
    "cql_filter", "cluster_cc", "fingerprint", "keyset_page",
    # two of the round-5 promoted rows (cheap ones; the full 50-query
    # sweep is tools/oracle_check.py, run per round by the driver)
    "line_dedup", "dsir_weights",
]


def test_contract_shape():
    qs = em.queries()
    oracles = em.oracle_sql()
    assert len(qs) >= 25
    # the driver records CORRECTNESS rows for at most the first 50
    # queries() keys and SILENTLY drops the rest (observed r01-r03);
    # going over the cap loses hard correctness evidence
    assert len(qs) <= 50, "driver caps CORRECTNESS at 50 queries"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle without query: {unknown}"
    # every query is callable
    for fn in qs.values():
        assert callable(fn)


def test_entry_smoke(spark):
    df = em.entry(spark)
    assert df.count() > 0
    assert df.columns == ["record_id", "cluster_id"]


EVENT_QUERIES = ["sessionize", "hourly_rollup", "topk_per_type"]


def _pool_q():
    return {**em.queries(), **em.retired_queries()}


def _pool_sql():
    return {**em.oracle_sql(), **em.retired_oracle_sql()}


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_queries_timestamp_encoding_agnostic(spark, name, tmp_path):
    """The driver regenerates events.parquet every round and its ts
    encoding has changed before (r03: the three event-window queries
    lost their CORRECTNESS rows across a regeneration). Pin that the
    queries produce oracle-identical results whatever parquet chose:
    naive micros (NTZ), UTC-adjusted micros, or int64 nanos."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/events.parquet")
    i = src.schema.get_field_index("ts")
    ts = src.column("ts").cast(pa.timestamp("us"))
    variants = {
        "ntz_us": ts,
        "utc_us": ts.cast(pa.timestamp("us", tz="UTC")),
        "ntz_ns": ts.cast(pa.timestamp("ns")),
    }
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    dcols, drows, dtags = arrow_rows(con.execute(_pool_sql()[name]).arrow())
    want = table_hash(drows, dcols, dtags)
    for label, col in variants.items():
        d = tmp_path / label
        d.mkdir()
        tbl = src.set_column(i, pa.field("ts", col.type), col)
        pq.write_table(tbl, d / "events.parquet", version="2.6")
        sdf = _pool_q()[name](spark, str(d))
        scols, srows, stags = arrow_rows(sdf.toArrow())
        assert sorted(scols) == sorted(dcols), label
        assert table_hash(srows, scols, stags) == want, label


@pytest.mark.exhaustive  # constructs all 95 contract frames (~100 s); schema shape only changes on a contract rotation, which optimization rounds forbid
def test_contract_rows_scalar_only(spark):
    """The driver's canonicalizer pandas-sorts object columns and dies
    on unhashable cells (r7: pq_codes ERR'd on an array<bigint>
    column). Pin that every contract row — live AND retired — emits
    only atomic column types, so no future rotation trips this."""
    from pyspark.sql import types as T

    atomic = (T.AtomicType,)
    bad = []
    for name, fn in _pool_q().items():
        schema = fn(spark, SF).schema
        for f in schema.fields:
            if not isinstance(f.dataType, atomic):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, f"non-scalar contract columns: {bad}"


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_sample(spark, name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    sdf = _pool_q()[name](spark, SF)
    scols, srows, stags = arrow_rows(sdf.toArrow())
    dcols, drows, dtags = arrow_rows(con.execute(_pool_sql()[name]).arrow())
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert table_hash(srows, scols, stags) == table_hash(drows, dcols, dtags)
