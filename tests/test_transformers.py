"""Built-in marc-transformer tests, pinned to the reference's module
test fixtures (ModuleTest.java:57-200 recordsIn → recordOut for
ModuleScripts.TEST_SCRIPT_1 == js/transformers/marc-transformer.mjs)."""

import json

from mod_reservoir_spark.functions.modules import register_defaults
from mod_reservoir_spark.functions.transformers import marc_transformer

RECORDS_IN = [
    {
        "globalId": "source-1-record-1",
        "localId": "REC:A",
        "sourceId": "source-1",
        "payload": {
            "marc": {
                "leader": "leader-1",
                "fields": [
                    {"245": {"subfields": [{"a": "source-1 title"}]}},
                    {"998": {"subfields": [{"x": "source-1 location"}]}},
                ],
            }
        },
    },
    {
        "globalId": "source-2-record-2",
        "localId": "rec_1",
        "sourceId": "source-2",
        "payload": {
            "marc": {
                "leader": "leader-1",
                "fields": [
                    {"245": {"subfields": [{"a": "source-2 title"}]}},
                    {"998": {"subfields": [{"x": "source-2 location"}]}},
                ],
            }
        },
    },
]

EXPECTED = {
    "leader": "new leader",
    "fields": [
        {"245": {"subfields": [{"a": "source-1 title"}]}},
        {"998": {"subfields": [{"x": "source-1 location"}]}},
        {"999": {"ind1": "1", "ind2": "0", "subfields": [
            {"i": "source-1-record-1"}, {"l": "REC:A"}, {"s": "source-1"}]}},
        {"245": {"subfields": [{"a": "source-2 title"}]}},
        {"998": {"subfields": [{"x": "source-2 location"}]}},
        {"999": {"ind1": "1", "ind2": "0", "subfields": [
            {"i": "source-2-record-2"}, {"l": "rec_1"}, {"s": "source-2"}]}},
    ],
}


def test_marc_transformer_matches_reference_fixture():
    assert marc_transformer({"records": RECORDS_IN}) == EXPECTED


def test_marc_transformer_registered():
    reg = register_defaults()
    fn = reg.resolve("marc-transformer::transform")
    assert fn({"records": RECORDS_IN}) == EXPECTED


def test_marc_transformer_in_oai_export(spark, warehouse):
    """End-to-end: ingest two records sharing a match value, export via
    list_records with the built-in transformer — the metadata is the
    merged record with one 999 per member."""
    from mod_reservoir_spark.operators.oai import list_records
    from mod_reservoir_spark.streaming.ingest import ingest_batch

    def payload(local_id):
        return json.dumps(
            {"marc": {"leader": "x" * 24,
                      "fields": [{"001": local_id}]},
             "inventory": {"issn": ["9"]}}
        )

    inc = spark.createDataFrame(
        [("M1", "S1", 1, payload("M1"), None),
         ("M2", "S2", 1, payload("M2"), None)],
        "local_id string, source_id string, source_version int, "
        "payload string, delete boolean",
    )
    cfg = {
        "id": "issn",
        "method": "jsonpath",
        "params": json.dumps({"expr": "$.inventory.issn[*]"}),
        "update": "ingest",
    }
    ingest_batch(warehouse, inc, [cfg])

    reg = register_defaults()
    res = list_records(
        warehouse.read("cluster_meta"),
        warehouse.read("cluster_assignments"),
        warehouse.read("global_records"),
        warehouse.read("record_match_values"),
        "issn",
        transformer=reg.resolve("marc-transformer::transform"),
    )
    assert len(res["records"]) == 1
    xml = res["records"][0]["metadata"]
    assert "new leader" in xml
    assert xml.count('<datafield tag="999" ind1="1" ind2="0">') == 2
    assert '<subfield code="l">M1</subfield>' in xml
    assert '<subfield code="l">M2</subfield>' in xml
    assert '<subfield code="s">S1</subfield>' in xml
