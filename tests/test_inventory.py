"""Inventory-transform tests: the Python port in
functions/inventory.py is pinned to the REAL reference stylesheet —
xsl/marc2inventory-instance.xsl is executed through the Spark driver
JVM's javax.xml.transform (the same engine family the reference client
uses) and its XML output converted with a port of InventoryToXml's
arr/i convention; the Python transform must produce the identical
JSON for every fixture record."""

import os
import xml.etree.ElementTree as ET

import pytest

from mod_reservoir_spark.functions.inventory import (
    create_ingest_record,
    localid_inventory,
    marc_to_inventory,
)
from mod_reservoir_spark.sources.marcxml import parse_marcxml

XSL_DIR = "/root/reference/xsl"
RES = "/root/reference/util/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{XSL_DIR}/marc2inventory-instance.xsl"),
    reason="reference stylesheets not present",
)


def jvm_xslt(spark, xsl_path: str, xml_str: str) -> str:
    """Run a real XSLT 1.0 transform in the driver JVM (JDK Xalan)."""
    jvm = spark._jvm
    tf = jvm.javax.xml.transform.TransformerFactory.newInstance()
    templates = tf.newTemplates(
        jvm.javax.xml.transform.stream.StreamSource(
            jvm.java.io.StringReader(open(xsl_path).read())
        )
    )
    tr = templates.newTransformer()
    sw = jvm.java.io.StringWriter()
    tr.transform(
        jvm.javax.xml.transform.stream.StreamSource(
            jvm.java.io.StringReader(xml_str)
        ),
        jvm.javax.xml.transform.stream.StreamResult(sw),
    )
    return sw.toString()


def _local(tag: str) -> str:
    return tag.split("}")[-1]


def inventory_xml_to_json(elem, skip: str = "original"):
    """Port of InventoryToXml.xmlToJsonObject (InventoryToXml.java:
    48-120): first-child <arr> → array of <i> contents, element
    children → object (skip skipped), text → string, empty → null."""
    kids = list(elem)
    if kids and _local(kids[0].tag) == "arr":
        return [inventory_xml_to_json(i, skip) for i in list(kids[0])]
    if kids:
        return {
            _local(c.tag): inventory_xml_to_json(c, skip)
            for c in kids
            if _local(c.tag) != skip
        }
    return elem.text if elem.text else None


def fixture_records():
    """(marcxml_str, marc_json) per record in the reference fixture."""
    tree = ET.parse(f"{RES}/record10.xml")
    out = []
    for rec in tree.getroot():
        xml = ET.tostring(rec, encoding="unicode")
        marc = list(parse_marcxml(xml.encode()))[0]
        out.append((xml, marc))
    return out


def test_python_transform_matches_real_stylesheet(spark):
    fixtures = fixture_records()
    assert len(fixtures) == 10
    mismatches = []
    for xml, marc in fixtures:
        out_xml = jvm_xslt(spark, f"{XSL_DIR}/marc2inventory-instance.xsl", xml)
        root = ET.fromstring(out_xml)  # <collection><record>…
        expected = inventory_xml_to_json(root)["record"]
        got = marc_to_inventory(marc)
        if got != expected:
            mismatches.append((marc.get("fields", [{}])[0], expected, got))
    assert not mismatches, mismatches[:1]


def test_localid_stylesheet_equivalent(spark):
    xml, marc = fixture_records()[0]
    out_xml = jvm_xslt(spark, f"{XSL_DIR}/localid.xsl", xml)
    expected = inventory_xml_to_json(ET.fromstring(out_xml))
    assert localid_inventory(marc) == expected
    assert expected["localIdentifier"] == "a1"


def test_ingest_with_inventory_spark_path(spark):
    """with_inventory=True populates payload.inventory inside the
    decode batch — end-to-end over the reference MARCXML fixture."""
    import json

    from mod_reservoir_spark.sources.ingest_records import marc_df_to_ingest
    from mod_reservoir_spark.sources.marcxml import read_marcxml

    marc_df = read_marcxml(spark, f"{RES}/record10.xml")
    ingest = marc_df_to_ingest(marc_df, "INV", with_inventory=True)
    rows = ingest.collect()
    assert len(rows) == 10
    payloads = [json.loads(r.payload) for r in rows]
    assert all("inventory" in p for p in payloads)
    by_id = {p["inventory"]["localIdentifier"]: p for p in payloads}
    assert by_id["a1"]["inventory"]["instance"]["source"] == "MARC"
    assert by_id["a1"]["inventory"]["instance"]["title"]


def chain_oracle(spark, xml: str) -> dict:
    """Run the REAL CST stylesheet chain (instance → holdings-items →
    library-codes, the Client.java:197-260 --xsl sequence) in the
    driver JVM and convert like InventoryToXml."""
    out = xml
    for xsl in (
        "marc2inventory-instance.xsl",
        "holdings-items-cst.xsl",
        "library-codes-cst.xsl",
    ):
        out = jvm_xslt(spark, f"{XSL_DIR}/{xsl}", out)
    return inventory_xml_to_json(ET.fromstring(out))["record"]


def test_cst_chain_matches_real_stylesheets(spark):
    """The dict port of the full holdings chain is pinned to the real
    stylesheets on every reference fixture record (record10.xml has
    999 fields, so the per-location holdings/items logic is live)."""
    from mod_reservoir_spark.functions.inventory import cst_inventory

    fixtures = fixture_records()
    assert len(fixtures) == 10
    mismatches = []
    for xml, marc in fixtures:
        expected = chain_oracle(spark, xml)
        got = cst_inventory(marc)
        if got != expected:
            mismatches.append((marc.get("fields", [{}])[0], expected, got))
    assert not mismatches, mismatches[:1]


SYNTH_999 = """<record xmlns="http://www.loc.gov/MARC21/slim">
  <leader>01000cas a2200000   4500</leader>
  <controlfield tag="001">h1</controlfield>
  <datafield tag="999" ind1=" " ind2=" ">
    <subfield code="l">zloc</subfield>
    <subfield code="i">I1</subfield>
    <subfield code="a">CN1</subfield>
  </datafield>
  <datafield tag="999" ind1=" " ind2=" ">
    <subfield code="l">aloc</subfield>
    <subfield code="i">I2</subfield>
    <subfield code="c">2</subfield>
  </datafield>
  <datafield tag="999" ind1=" " ind2=" ">
    <subfield code="l">zloc</subfield>
    <subfield code="i">I3</subfield>
  </datafield>
  <datafield tag="999" ind1=" " ind2=" ">
    <subfield code="l">xxxx</subfield>
    <subfield code="i">I4</subfield>
  </datafield>
  <datafield tag="999" ind1=" " ind2=" ">
    <subfield code="l">bloc</subfield>
    <subfield code="i">I5</subfield>
  </datafield>
  <datafield tag="999" ind1=" " ind2=" ">
    <subfield code="l">bloc</subfield>
    <subfield code="i">I6</subfield>
  </datafield>
</record>"""


def test_cst_chain_999_quirks_pinned(spark):
    """Synthetic record pinning the tricky holdings semantics against
    the real stylesheets: the XSLTC preceding-sibling quirk ($preloc
    is always the FIRST 999's location — so the repeated zloc IS
    deduped, while the repeated bloc yields TWO holdings entries),
    the xxxx 'Will lend' ILL policy, missing call numbers / copy
    numbers → null, and the serials material-type branch
    (leader[7]='s' → CNR)."""
    from mod_reservoir_spark.functions.inventory import cst_inventory

    marc = list(parse_marcxml(SYNTH_999.encode()))[0]
    expected = chain_oracle(spark, SYNTH_999)
    got = cst_inventory(marc)
    assert got == expected
    holdings = got["holdingsRecords"]
    locs = [h["permanentLocationDeref"] for h in holdings]
    assert locs == ["aloc", "bloc", "bloc", "xxxx", "zloc"]
    by_loc = {h["permanentLocationDeref"]: h for h in holdings}
    assert by_loc["xxxx"]["illPolicyDeref"] == "Will lend"
    assert by_loc["aloc"]["illPolicyDeref"] == "Will not lend"
    assert [i["itemIdentifier"] for i in by_loc["zloc"]["items"]] == [
        "I1",
        "I3",
    ]
    assert [i["itemIdentifier"] for i in by_loc["bloc"]["items"]] == [
        "I5",
        "I6",
    ]
    assert by_loc["zloc"]["callNumber"] == "CN1"
    assert by_loc["zloc"]["items"][0]["materialTypeDeref"].startswith("CNR")


def test_cst_chain_no_999_unmapped(spark):
    """A record without 999 fields yields the single Unmapped
    holdings entry (holdings-items-cst.xsl:99-103)."""
    from mod_reservoir_spark.functions.inventory import cst_inventory

    xml = SYNTH_999.split("<datafield")[0] + "</record>"
    marc = list(parse_marcxml(xml.encode()))[0]
    expected = chain_oracle(spark, xml)
    got = cst_inventory(marc)
    assert got == expected
    assert got["holdingsRecords"] == [{"permanentLocationDeref": "Unmapped"}]
    assert got["institutionDeref"] == "US-CSt"


def test_cst_ingest_spark_path(spark):
    """with_inventory='cst' populates holdingsRecords end-to-end."""
    import json

    from mod_reservoir_spark.sources.ingest_records import marc_df_to_ingest
    from mod_reservoir_spark.sources.marcxml import read_marcxml

    marc_df = read_marcxml(spark, f"{RES}/record10.xml")
    ingest = marc_df_to_ingest(marc_df, "INV", with_inventory="cst")
    payloads = [json.loads(r.payload) for r in ingest.collect()]
    assert len(payloads) == 10
    assert all("holdingsRecords" in p["inventory"] for p in payloads)
    assert all(
        p["inventory"].get("institutionDeref") == "US-CSt" for p in payloads
    )


def test_create_ingest_record_contract():
    _xml, marc = fixture_records()[0]
    rec = create_ingest_record(marc)
    assert rec["localId"] == "a1"
    assert rec["payload"]["marc"] is marc
    assert rec["payload"]["inventory"]["instance"]["source"] == "MARC"
    with pytest.raises(ValueError, match="missing record/localIdentifier"):
        create_ingest_record({"leader": "x", "fields": []})


def test_cst_chain_mixed_case_location_sort(spark):
    """xsl:sort under the JDK engine uses the en-locale collator, NOT
    ASCII order: mixed-case location codes interleave
    case-insensitively ('nosuchloc' sorts between 'GUNST' and
    'STACKS'). Pinned against the real stylesheets; inventory.py
    reproduces the collator with _collation_key."""
    from mod_reservoir_spark.functions.inventory import cst_inventory

    xml = (
        SYNTH_999.replace("zloc", "STACKS")
        .replace("aloc", "GUNST")
        .replace("bloc", "nosuchloc")
    )
    marc = list(parse_marcxml(xml.encode()))[0]
    expected = chain_oracle(spark, xml)
    got = cst_inventory(marc)
    assert got == expected
    locs = [h["permanentLocationDeref"] for h in got["holdingsRecords"]]
    assert locs == ["GUNST", "nosuchloc", "nosuchloc", "STACKS", "xxxx"]
