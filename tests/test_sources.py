"""Format-source tests against the reference's golden fixtures
(FIXTURES.md §F5), read from the read-only reference tree."""

import json
import os

import pytest

from mod_reservoir_spark.sources.ingest_records import group_ingest_records
from mod_reservoir_spark.sources.iso2709 import parse_iso2709
from mod_reservoir_spark.sources.jsonarray import parse_envelope
from mod_reservoir_spark.sources.marcxml import fix_xml_bytes, parse_marcxml

RES = "/root/reference/util/src/test/resources"
SRES = "/root/reference/server/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RES), reason="reference fixtures not present"
)


def read(p):
    return open(p, "rb").read()


def test_iso2709_marc3_roundtrip_vs_xml():
    """ISO2709 and MARCXML decodes of the same records agree byte-exact.

    Record 3 is MARC-8 with the full ANSEL repertoire plus greek /
    sub / superscript escapes — conversion via functions/marc8.py must
    reproduce the reference's marc4j output (marc3.xml), including the
    leader[9] → 'a' rewrite and U+0360/U+0361 double-mark merging."""
    iso = list(parse_iso2709(read(f"{RES}/marc3.marc")))
    xml = list(parse_marcxml(read(f"{RES}/marc3.xml")))
    assert len(iso) == len(xml) == 3
    for a, b in zip(iso, xml):
        assert a["leader"] == b["leader"]
        assert a["fields"] == b["fields"]


def test_iso2709_framing_tolerates_junk():
    data = read(f"{RES}/marc3.marc")
    recs = list(parse_iso2709(data))
    # insert ≤4 junk bytes between records
    framed = b""
    for raw in [data]:
        framed = raw
    junky = framed[:942] + b"\n\n" + framed[942:]
    assert len(list(parse_iso2709(junky))) == len(recs)


def test_marcxml_record10():
    recs = list(parse_marcxml(read(f"{RES}/record10.xml")))
    assert len(recs) == 10
    for r in recs:
        assert "leader" in r and r["fields"]


def test_delete_tombstone_marker():
    # the fixture deliberately contains an invalid character reference
    # → exercises the XmlFixer path (reference XmlFixerMapper)
    recs = list(parse_marcxml(read(f"{SRES}/marc1-delete.xml"), xml_fixing=True))
    ingest = list(group_ingest_records(recs))
    assert any(i["delete"] for i in ingest)


def test_no_id_record_has_no_local_id():
    recs = list(parse_marcxml(read(f"{SRES}/marc3-no-id.xml")))
    ingest = list(group_ingest_records(recs))
    assert any(i["localId"] is None for i in ingest)


def test_holdings_grouping_mfhd():
    recs = list(parse_iso2709(read(f"{RES}/mfhd.marc")))
    ingest = list(group_ingest_records(recs))
    held = [i for i in ingest if i["payload"].get("marcHoldings")]
    assert held, "expected at least one bib with attached holdings"
    for i in ingest:
        assert "marc" in i["payload"]


def test_holdings_without_parent_skipped_or_strict():
    recs = list(parse_iso2709(read(f"{RES}/mfhd-no-parent.marc")))
    assert list(group_ingest_records(recs, strict=False)) is not None
    from mod_reservoir_spark.sources.ingest_records import (
        HoldingsWithoutParent,
    )

    if recs and any(
        any(tag == "004" for f in r["fields"] for tag in f) for r in recs[:1]
    ):
        with pytest.raises(HoldingsWithoutParent):
            list(group_ingest_records(recs, strict=True))


def test_xml_fixer_bad_entities():
    fixed = fix_xml_bytes(read(f"{RES}/small-bad-entities.xml"))
    recs = list(parse_marcxml(fixed))
    assert isinstance(recs, list)


def test_json_envelope_records_in():
    ingest = list(parse_envelope(read(f"{RES}/records-in.json")))
    assert ingest
    first = ingest[0]
    assert first["local_id"] == "a1"
    payload = json.loads(first["payload"])
    assert "marc" in payload and payload["marc"]["fields"]


def test_spark_end_to_end_marcxml_ingest(spark, warehouse):
    """record10.xml → read_marcxml → ingest mapper → ingest_batch →
    10 records in the warehouse, each its own goldrush-less pool."""
    from mod_reservoir_spark.sources.ingest_records import marc_df_to_ingest
    from mod_reservoir_spark.sources.marcxml import read_marcxml
    from mod_reservoir_spark.streaming.ingest import ingest_batch

    marc_df = read_marcxml(spark, f"{RES}/record10.xml")
    ingest_df = marc_df_to_ingest(marc_df, "XMLSRC")
    cfg = {
        "id": "title",
        "method": "jsonpath",
        "params": json.dumps({"expr": "$.marc.fields[*].001"}),
        "update": "ingest",
    }
    stats = ingest_batch(warehouse, ingest_df, [cfg])
    assert stats["processed"] == 10
    assert warehouse.read("global_records").count() == 10
    assert (
        warehouse.read("cluster_assignments")
        .filter("match_key_config_id = 'title'")
        .count()
        == 10
    )


def test_gzip_input(spark, tmp_path):
    import gzip

    from mod_reservoir_spark.sources.marcxml import read_marcxml

    gz = tmp_path / "records.xml.gz"
    gz.write_bytes(gzip.compress(read(f"{RES}/record10.xml")))
    recs = read_marcxml(spark, str(gz))
    assert recs.count() == 10


def test_source_id_validation(spark):
    from mod_reservoir_spark.core.storage import normalize_source_ids

    df = spark.createDataFrame([("a", "bib1", 1)], "local_id string, source_id string, source_version int")
    out = normalize_source_ids(df).collect()
    assert out[0].source_id == "BIB1"
    bad = spark.createDataFrame([("a", "has space!", 1)], "local_id string, source_id string, source_version int")
    import pytest as _pytest

    with _pytest.raises(Exception, match="invalid sourceId"):
        normalize_source_ids(bad).collect()


def test_marc8_conversion_edges():
    from mod_reservoir_spark.functions.marc8 import marc8_to_unicode

    # combining diacritic precedes base in MARC-8, follows in Unicode
    assert marc8_to_unicode(b"p\xe2erez") == "pe\u0301rez"
    # ligature / double-tilde halves merge to spanning marks after
    # the first base character (marc4j permissive behavior)
    assert marc8_to_unicode(b"\xebt\xecs") == "t\u0361s"
    assert marc8_to_unicode(b"\xfan\xfbg") == "n\u0360g"
    # single-byte G0 escapes: subscript / superscript / greek / reset
    assert marc8_to_unicode(b"H\x1bb2\x1bsO") == "H\u2082O"
    assert marc8_to_unicode(b"x\x1bp2\x1bs") == "x\u00b2"
    assert marc8_to_unicode(b"\x1bga\x1bs") == "\u03b1"
    # multi-char designations: ESC ( B -> ASCII G0, ESC ) ! E -> ANSEL G1
    assert marc8_to_unicode(b"\x1b(Babc") == "abc"
    assert marc8_to_unicode(b"\x1b)!E\xa5") == "\u00c6"
    # mapped non-Latin set: basic cyrillic 0x41/0x42 are lowercase
    assert marc8_to_unicode(b"\x1b(NAB\x1b(BAB") == "\u0430\u0431AB"
    # EACC consumes 3 bytes per char
    assert marc8_to_unicode(b"\x1b$1!!!\x1b(BA") == "\ufffdA"
    # truncated escape at end of data does not loop or throw
    assert marc8_to_unicode(b"abc\x1b") == "abc"


def test_marc8_extended_sets():
    """Basic/extended Cyrillic, Hebrew, Arabic tables (LoC code
    tables). Anchor bytes are derived independently of the tables via
    the KOI-7 / ISO 8859-8 / ISO 8859-6 layout correspondences."""
    from mod_reservoir_spark.functions.marc8 import marc8_to_unicode

    esc = bytes([0x1B])
    # Cyrillic G0 (ESC ( N): "Moskva" in the KOI-7 letter order
    data = esc + b"(N" + bytes([0x6D, 0x4F, 0x53, 0x4B, 0x57, 0x41])
    assert marc8_to_unicode(data) == "\u041c\u043e\u0441\u043a\u0432\u0430"
    # Ukrainian yi from extended Cyrillic mid-word: "Kyiv"
    data = (esc + b"(N" + bytes([0x6B, 0x49])
            + esc + b"(Q" + bytes([0x27])
            + esc + b"(N" + bytes([0x57]))
    assert marc8_to_unicode(data) == "\u041a\u0438\u0457\u0432"
    # extended Cyrillic uppercase pairs incl. ghe-with-upturn and yat
    data = esc + b"(Q" + bytes([0x41, 0x21, 0x4F, 0x2F])
    assert marc8_to_unicode(data) == "\u0490\u0491\u0462\u0463"
    # Hebrew (ESC ( 2): "shalom"
    data = esc + b"(2" + bytes([0x79, 0x6C, 0x65, 0x6D])
    assert marc8_to_unicode(data) == "\u05e9\u05dc\u05d5\u05dd"
    # Hebrew point (combining, precedes base in MARC-8): dagesh + bet
    data = esc + b"(2" + bytes([0x4B, 0x61])
    assert marc8_to_unicode(data) == "\u05d1\u05bc"
    # Arabic (ESC ( 3): "kitab" + space + Arabic-Indic digits 19
    data = esc + b"(3" + bytes([0x63, 0x4A, 0x47, 0x48, 0x20, 0x31, 0x39])
    assert marc8_to_unicode(data) == "\u0643\u062a\u0627\u0628 \u0661\u0669"
    # Arabic shadda (combining) over lam
    data = esc + b"(3" + bytes([0x71, 0x64])
    assert marc8_to_unicode(data) == "\u0644\u0651"
    # switch back to Latin
    data = esc + b"(N" + bytes([0x61]) + esc + b"(B" + b"abc"
    assert marc8_to_unicode(data) == "\u0410abc"
