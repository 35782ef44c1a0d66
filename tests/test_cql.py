"""CQL-subset parser tests (field bindings per FIXTURES.md §F6)."""

import pytest

from mod_reservoir_spark.plans.cql import CqlError, parse_cql

FIELDS = {
    "localId": "local_id",
    "sourceId": "source_id",
    "sourceVersion": ("source_version", "numeric"),
}


def test_all_records():
    q = parse_cql("cql.allRecords = true")
    assert q.to_sql(FIELDS) == "TRUE"
    assert parse_cql(None).to_sql(FIELDS) == "TRUE"
    assert parse_cql("").to_sql(FIELDS) == "TRUE"


def test_equality_and_relations():
    assert (
        parse_cql('sourceId = "BIB1"').to_sql(FIELDS) == "(source_id = 'BIB1')"
    )
    assert parse_cql("sourceVersion > 2").to_sql(FIELDS) == "(source_version > 2)"
    assert parse_cql("sourceVersion <> 2").to_sql(FIELDS) == "(source_version <> 2)"


def test_boolean_ops_and_parens():
    q = parse_cql('sourceId = BIB1 AND (localId = S1 OR localId = S2)')
    assert (
        q.to_sql(FIELDS)
        == "((source_id = 'BIB1') AND ((local_id = 'S1') OR (local_id = 'S2')))"
    )
    q2 = parse_cql("NOT sourceVersion = 1")
    assert q2.to_sql(FIELDS) == "(NOT (source_version = 1))"


def test_sortby():
    q = parse_cql("sourceId = A sortBy localId sourceVersion/sort.descending")
    assert q.order_by_sql(FIELDS) == "local_id ASC, source_version DESC"


def test_unknown_field_rejected():
    with pytest.raises(CqlError):
        parse_cql("bogus = 1").to_sql(FIELDS)


def test_text_field_keeps_numeric_looking_literal():
    """ADVICE r1: id-like fields are PG text in the reference —
    'localId = 0001' compares the string '0001', never the int 1."""
    assert parse_cql("localId = 0001").to_sql(FIELDS) == "(local_id = '0001')"


def test_numeric_field_rejects_non_numeric_literal():
    with pytest.raises(CqlError):
        parse_cql("sourceVersion = abc").to_sql(FIELDS)


def test_text_literal_not_coerced_on_spark_side(spark):
    df = spark.createDataFrame(
        [("0001", "B", 1), ("1", "B", 1)],
        "local_id string, source_id string, source_version int",
    )
    q = parse_cql("localId = 0001")
    got = {r.local_id for r in df.filter(q.to_column(FIELDS)).collect()}
    assert got == {"0001"}


def test_spark_column_matches_sql(spark):
    df = spark.createDataFrame(
        [("S1", "BIB1", 1), ("S2", "BIB1", 2), ("S3", "BIB2", 1)],
        "local_id string, source_id string, source_version int",
    )
    df.createOrReplaceTempView("recs")
    for cql in [
        'sourceId = "BIB1"',
        "sourceVersion >= 2",
        'sourceId = BIB1 AND NOT sourceVersion = 1',
        'localId = S1 OR localId = S3',
    ]:
        q = parse_cql(cql)
        via_col = {r.local_id for r in df.filter(q.to_column(FIELDS)).collect()}
        via_sql = {
            r.local_id
            for r in spark.sql(
                f"SELECT local_id FROM recs WHERE {q.to_sql(FIELDS)}"
            ).collect()
        }
        assert via_col == via_sql, cql
