"""GoldRush golden-corpus tests (FIXTURES.md §F4): exact-string asserts
against the reference's assertion file, loaded from the read-only
reference tree (js/test/assertions-goldrush2024.json)."""

import json
import os

import pytest

from mod_reservoir_spark.functions.goldrush import (
    goldrush_udf,
    matchkey,
    matchkey_or_error,
)

REF = "/root/reference/js"
ASSERTIONS = f"{REF}/test/assertions-goldrush2024.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ASSERTIONS), reason="reference corpus not present"
)


def corpus():
    assertions = json.load(open(ASSERTIONS))
    for path, expected in assertions.items():
        raw = open(f"{REF}/{path}").read()
        yield path, raw, expected


def payload_of(raw: str) -> str:
    return json.dumps({"marc": json.loads(raw)})


def test_golden_corpus_exact():
    """Every parseable record and the MARC-structure errors match the
    reference byte-for-byte. The one documented deviation: V8's JSON
    syntax error text differs from Python's."""
    mismatches = []
    for path, raw, expected in corpus():
        try:
            got = matchkey_or_error(payload_of(raw))
        except json.JSONDecodeError:
            got = "<json-error>"
        if "broken-json" in path:
            assert got == "<json-error>"
            continue
        if got != expected:
            mismatches.append((path, expected, got))
    assert not mismatches, mismatches


def test_error_messages_match_reference():
    assert (
        matchkey_or_error(json.dumps({"marc": {"fields": "nope"}}))
        == "MARC fields is not an array."
    )
    assert (
        matchkey_or_error(json.dumps({"marc": {}}))
        == "MARC fields array is missing."
    )


def test_default_leader_applied():
    # non-'r' dateType reads date2 (008[11:15]) — goldrush.mjs:168-174
    key = matchkey(
        json.dumps({"marc": {"fields": [{"008": "000000s19992000xx"}]}})
    )
    # default leader '00000nam a22000000a 4500' → typeOfRecord 'a'
    assert key[70 + 4 + 4 + 3 + 5] == "a"
    assert key[70:74] == "2000"


def test_goldrush_as_spark_udf(spark):
    rows = [
        (path, payload_of(raw))
        for path, raw, _ in corpus()
        if "invalid" not in path
    ]
    expected = {
        path: exp for path, _, exp in corpus() if "invalid" not in path
    }
    df = spark.createDataFrame(rows, "path string, payload string")
    got = {
        r.path: r.key
        for r in df.select(
            "path", goldrush_udf()(df.payload).alias("key")
        ).collect()
    }
    assert got == expected
