"""XML render utilities: text encoding, MARC-in-JSON → MARCXML, and the
999-identifier cluster merge.

Behavior re-expressed from the reference:
- text encoding (util/.../EncodeXmlText.java:14-57): ASCII escapes for
  & < > ' ", U+FFFD for illegal XML chars, numeric character
  references for all non-ASCII;
- MARCXML render (util/.../JsonToMarcXml.java:29-77): slim namespace,
  2-space indents, controlfield/datafield/subfield, ind1..ind9;
- cluster merge (server/.../OaiService.getMetadataJava:224-263,
  util/.../MarcInJsonUtil.java:26-116): first member's MARC is the
  base; members' blank-indicator 999s collapse into one; a new
  999 ind1=1 ind2=0 carries $i clusterId, $m match values, and
  ($l localId, $s sourceId, $v version) per member.
"""

from __future__ import annotations


def encode_xml_text(s: str) -> str:
    out = []
    for ch in s:
        c = ord(ch)
        if c < 0x80:
            if c < 0x20 and ch not in "\t\r\n":
                out.append("&#xFFFD;")
            elif ch == "&":
                out.append("&amp;")
            elif ch == ">":
                out.append("&gt;")
            elif ch == "<":
                out.append("&lt;")
            elif ch == "'":
                out.append("&apos;")
            elif ch == '"':
                out.append("&quot;")
            else:
                out.append(ch)
        elif 0xD800 <= c <= 0xDFFF or c in (0xFFFE, 0xFFFF):
            out.append("&#xFFFD;")
        else:
            out.append(f"&#x{c:x};")
    return "".join(out)


def json_to_marcxml(marc: dict) -> str:
    """MARC-in-JSON → MARCXML string (exact shape of the reference's
    renderer: namespace on <record>, newline formatting, ind1..9)."""
    s = ['<record xmlns="http://www.loc.gov/MARC21/slim">\n']
    leader = marc.get("leader")
    if leader is not None:
        s.append(f"  <leader>{encode_xml_text(leader)}</leader>\n")
    for field in marc.get("fields") or []:
        for tag, value in field.items():
            if isinstance(value, str):
                s.append(
                    f'  <controlfield tag="{encode_xml_text(tag)}">'
                    f"{encode_xml_text(value)}</controlfield>\n"
                )
            elif isinstance(value, dict):
                s.append(f'  <datafield tag="{encode_xml_text(tag)}')
                for j in range(1, 10):
                    ind = value.get(f"ind{j}")
                    if ind is not None:
                        s.append(f'" ind{j}="{encode_xml_text(ind)}')
                s.append('">\n')
                for sf in value.get("subfields") or []:
                    for code, sval in sf.items():
                        s.append(
                            f'    <subfield code="{encode_xml_text(code)}">'
                            f"{encode_xml_text(sval)}</subfield>\n"
                        )
                s.append("  </datafield>\n")
    s.append("</record>")
    return "".join(s)


def lookup_marc_data_field(marc: dict, tag: str, ind1: str | None, ind2: str | None):
    """Subfields array of the first matching datafield (control fields
    come back as a one-element list, like the reference)."""
    for field in marc.get("fields") or []:
        for f, value in field.items():
            if f != tag:
                continue
            if isinstance(value, str):
                return [value]
            if isinstance(value, dict):
                if (ind1 is None or value.get("ind1") == ind1) and (
                    ind2 is None or value.get("ind2") == ind2
                ):
                    return value.setdefault("subfields", [])
    return None


def create_marc_data_field(marc: dict, tag: str, ind1: str, ind2: str) -> list:
    """Insert a new datafield in tag order; return its subfields list."""
    fields = marc.setdefault("fields", [])
    i = 0
    for i, field in enumerate(fields):
        stop = False
        for f in field:
            if tag <= f:
                stop = True
                break
        if stop:
            break
    else:
        i = len(fields)
    subfields: list = []
    fields.insert(i, {tag: {"ind1": ind1, "ind2": ind2, "subfields": subfields}})
    return subfields


def remove_marc_field(marc: dict, tag: str) -> None:
    fields = marc.get("fields") or []
    marc["fields"] = [f for f in fields if tag not in f]


def cluster_to_marcxml(cluster: dict) -> str | None:
    """ClusterBuilder-shaped dict → merged MARCXML metadata string;
    None for a deleted cluster (no live members)."""
    identifiers = [{"i": cluster.get("clusterId")}]
    for mv in cluster.get("matchValues") or []:
        identifiers.append({"m": mv})
    combined = None
    for member in cluster.get("records") or []:
        marc = (member.get("payload") or {}).get("marc")
        if marc is None:
            continue
        f999 = lookup_marc_data_field(marc, "999", " ", " ")
        if combined is None:
            combined = marc
        else:
            c999 = lookup_marc_data_field(combined, "999", " ", " ")
            if f999 is not None and c999 is not None:
                c999.extend(f999)
        identifiers.append({"l": member.get("localId")})
        identifiers.append({"s": member.get("sourceId")})
        identifiers.append({"v": str(member.get("sourceVersion"))})
    if combined is None:
        return None
    create_marc_data_field(combined, "999", "1", "0").extend(identifiers)
    return json_to_marcxml(combined)


# ---------------------------------------------------------------------------
# OAI-PMH schema validation (reference parity: the reference validates
# every OAI verb response against the official OAI-PMH.xsd in
# server/src/test/.../MainVerticleTest.java). No lxml in this
# container, so validation runs on the JVM Spark already carries
# (javax.xml.validation), against the schemas vendored under
# mod_reservoir_spark/resources/.

_OAI_SCHEMA_CACHE: dict[int, object] = {}


def _resource(name: str) -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources",
        name,
    )


def _oai_schema(spark):
    """Compiled javax.xml.validation.Schema over the vendored OAI-PMH
    2.0 + MARC21slim XSDs (both: the OAI <metadata> wildcard is
    processContents='strict', so embedded MARCXML needs its own schema
    in the same validator). Cached per JVM."""
    key = id(spark._jvm)
    schema = _OAI_SCHEMA_CACHE.get(key)
    if schema is None:
        jvm = spark._jvm
        factory = jvm.javax.xml.validation.SchemaFactory.newInstance(
            "http://www.w3.org/2001/XMLSchema"
        )
        sources = spark.sparkContext._gateway.new_array(
            jvm.javax.xml.transform.Source, 2
        )
        # MARC first: no cross-imports, order only matters for
        # readability
        sources[0] = jvm.javax.xml.transform.stream.StreamSource(
            jvm.java.io.File(_resource("MARC21slim.xsd"))
        )
        sources[1] = jvm.javax.xml.transform.stream.StreamSource(
            jvm.java.io.File(_resource("OAI-PMH.xsd"))
        )
        schema = factory.newSchema(sources)
        _OAI_SCHEMA_CACHE[key] = schema
    return schema


def validate_oai_xml(spark, xml: str) -> None:
    """Schema-validate one rendered OAI-PMH envelope (any verb,
    deleted headers, error envelopes, resumption-token pages, embedded
    MARCXML metadata). Raises ``ValueError`` carrying the SAX message
    on the first violation; returns None when valid."""
    from py4j.protocol import Py4JJavaError

    jvm = spark._jvm
    validator = _oai_schema(spark).newValidator()
    src = jvm.javax.xml.transform.stream.StreamSource(
        jvm.java.io.StringReader(xml)
    )
    try:
        validator.validate(src)
    except Py4JJavaError as e:
        raise ValueError(f"OAI-PMH schema violation: {e.java_exception}")
