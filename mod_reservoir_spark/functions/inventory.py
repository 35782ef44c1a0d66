"""MARC → FOLIO-inventory instance payload.

Python equivalent of the reference's XSLT ingest chain
(client/.../Client.java:197-260 applies the repeated ``--xsl``
stylesheets per record; util/.../IngestRecord.java:52-67 runs the
chain and util/.../InventoryToXml.java:48-120 converts the result XML
to JSON with the <arr>/<i> array convention, skipping <original>).
Ported stylesheets: marc2inventory-instance.xsl (→
:func:`marc_to_inventory`), localid.xsl (→ :func:`localid_inventory`),
and the consortium holdings chain holdings-items-cst.xsl +
library-codes-cst.xsl (→ :func:`cst_inventory`, producing
``inventory.holdingsRecords`` with per-location items).

The container has no XSLT engine importable from Python executors, so
the stylesheet's semantics are re-implemented here as a plain dict
transform over MARC-in-JSON — distributable as an Arrow-batched UDF.
The test suite runs the REAL stylesheet through the Spark driver JVM's
javax.xml.transform (tests/test_inventory.py) and asserts this
transform produces the identical JSON, fixture-for-fixture, so the
port is pinned to the actual XSL output, not to a re-reading of it.

Faithfully ported quirks: empty XSL output elements become JSON null
(no CHARACTERS event), <i> elements whose xsl:choose matched nothing
become null array entries, tag 711 falls to 'Personal name' (the
stylesheet tests @tage='711' — attribute typo — so the Meeting-name
branch never fires for 711), and the subjects for-each includes the
literal tag '69X' which never matches a real field.
"""

from __future__ import annotations

import re

TITLE_TRIM = ",-./ :;"
NAME_TRIM = ",-."

_INSTANCE_TYPE = {
    "a": "txt", "c": "ntm", "d": "ntm", "e": "cri", "f": "xxx",
    "g": "sti", "i": "snd", "j": "prm", "k": "xxx", "m": "cod",
    "o": "xxx", "p": "xxx", "r": "tdf", "t": "txt",
}

_IDENTIFIER_TYPES = {
    "010": "LCCN",
    "020": "ISBN",
    "022": "ISSN",
    "024": "Other standard identifier",
    "028": "Publisher or distributor number",
    "035": "System control number",
    "074": "GPO item number",
}

_CONTRIB_TAGS = ("100", "110", "111", "700", "710", "711")
_CONTRIB_SUBS = set("abcdfgjklnpqtu")
_SUBJECT_TAGS = {
    "600", "610", "611", "630", "648", "650", "651", "653", "654",
    "655", "656", "657", "658", "662", "69X",
}
_SUBJECT_SUBS = set("abcdfgjklnpqtuvxyz")
_NOTE_TYPES = {
    "504": "Bibliography note",
    "505": "Formatted Contents Note",
    "520": "Summary",
}

_WS = re.compile(r"\s+")


def _trim_last(s: str, chars: str) -> str:
    """remove-characters-last (marc2inventory-instance.xsl:367-383):
    strip trailing characters from the set — identical to rstrip."""
    return s.rstrip(chars)


def _collation_key(s: str):
    """Sort key reproducing the JDK en-locale RuleBasedCollator that
    XSLTC's ``xsl:sort`` uses for the holdings location sort (probed
    through the driver JVM — plain ASCII sort diverges on mixed-case
    codes): space and hyphen are primary-ignorable with secondary
    weights space < hyphen, letters fold case at primary (digits sort
    before letters), and lowercase precedes uppercase at tertiary.
    Ties beyond that keep document order (xsl:sort is stable, like
    Python's sorted)."""
    primary: list = []
    secondary: list = []
    tertiary: list = []
    for ch in s:
        if ch == " ":
            secondary.append((len(primary), 1))
        elif ch == "-":
            secondary.append((len(primary), 2))
        else:
            primary.append(ch.lower())
            tertiary.append(1 if ch.isalpha() and ch.isupper() else 0)
    return (primary, secondary, tertiary)


def _datafields(marc: dict, tags) -> list:
    out = []
    for f in marc.get("fields") or []:
        if not isinstance(f, dict):
            continue
        for tag, val in f.items():
            if tag in tags and isinstance(val, dict):
                out.append((tag, val))
    return out


def _controlfields(marc: dict, tag: str) -> list:
    return [
        val
        for f in marc.get("fields") or []
        if isinstance(f, dict)
        for t, val in f.items()
        if t == tag and isinstance(val, str)
    ]


def _subs(df: dict, codes) -> list:
    """Subfield values for the given codes, in document order."""
    return [
        v
        for sf in df.get("subfields") or []
        if isinstance(sf, dict)
        for c, v in sf.items()
        if c in codes
    ]


def _first(df: dict, code: str) -> str:
    vals = _subs(df, {code})
    return vals[0] if vals else ""


def _text(s: str):
    """An XSL output element with empty text serializes as an empty
    element, which InventoryToXml reads as JSON null."""
    return s if s else None


def marc_to_inventory(marc: dict) -> dict:
    """MARC-in-JSON dict → the inventoryPayload JSON the reference
    produces from marc2inventory-instance.xsl + InventoryToXml
    (the <record> content, <original> skipped)."""
    leader = marc.get("leader") or ""
    instance: dict = {
        "source": "MARC",
        "instanceTypeDeref": _INSTANCE_TYPE.get(leader[6:7], "xxx"),
    }

    # identifiers (xsl :60-121)
    ids_001 = _controlfields(marc, "001")
    id_dfs = _datafields(marc, set(_IDENTIFIER_TYPES) | {"001"})
    if ids_001 or _datafields(marc, set(_IDENTIFIER_TYPES)):
        arr: list = []
        for v in ids_001:
            arr.append({"value": _text(v), "identifierTypeDerefHere": None})
        for tag, df in id_dfs:
            a = _first(df, "a")
            if tag in _IDENTIFIER_TYPES and _subs(df, {"a"}):
                arr.append(
                    {"value": _text(a), "identifierTypeDeref": _IDENTIFIER_TYPES[tag]}
                )
            else:
                arr.append(None)  # xsl:choose matched nothing → empty <i>
        instance["identifiers"] = arr

    # classifications (xsl :123-163)
    cls_dfs = _datafields(marc, {"050", "060", "080", "082", "086", "090"})
    if cls_dfs:
        arr = []
        for tag, df in cls_dfs:
            if tag == "050":
                num = "; ".join(_subs(df, {"a", "b"}))
                arr.append(
                    {"classificationNumber": _text(num),
                     "classificationTypeDeref": "LC"}
                )
            elif tag == "082":
                num = "; ".join(_subs(df, {"a", "b"}))
                arr.append(
                    {"classificationNumber": _text(num),
                     "classificationTypeDeref": "Dewey"}
                )
            elif tag == "086":
                arr.append(
                    {"classificationNumber": _text(_first(df, "a")),
                     "classificationTypeDeref": "SUDOC"}
                )
            else:
                arr.append(None)
        instance["classifications"] = arr

    # title (xsl :165-180): first 245, subfields a b h n p joined by one
    # space, trailing ,-./ :; removed
    t245 = _datafields(marc, {"245"})
    title = ""
    if t245:
        title = _trim_last(" ".join(_subs(t245[0][1], set("abhnp"))), TITLE_TRIM)
    instance["title"] = _text(title)

    # contributors (xsl :182-226)
    contrib_dfs = _datafields(marc, set(_CONTRIB_TAGS))
    if contrib_dfs:
        arr = []
        for tag, df in contrib_dfs:
            name = ", ".join(
                _trim_last(v, NAME_TRIM) for v in _subs(df, _CONTRIB_SUBS)
            )
            i: dict = {"name": _text(name)}
            if tag in ("100", "700"):
                i["contributorNameTypeDeref"] = "Personal name"
                if tag == "100":
                    i["primary"] = "true"
            elif tag in ("110", "710"):
                i["contributorNameTypeDeref"] = "Corporate name"
            elif tag == "111":
                i["contributorNameTypeDeref"] = "Meeting name"
            else:  # 711: the stylesheet's @tage typo → otherwise branch
                i["contributorNameTypeDeref"] = "Personal name"
            e4 = _subs(df, {"e", "4"})
            if e4:
                i["contributorTypeDeref"] = _text(e4[0])
            arr.append(i)
        instance["contributors"] = arr

    # editions (xsl :228-240)
    ed_dfs = _datafields(marc, {"250"})
    if ed_dfs:
        arr = []
        for _tag, df in ed_dfs:
            s = _first(df, "a")
            if _subs(df, {"b"}):
                s += "; " + _first(df, "b")
            arr.append(_text(s))
        instance["editions"] = arr

    # publication (xsl :242-272)
    pub_dfs = _datafields(marc, {"260", "264"})
    if pub_dfs:
        instance["publication"] = [
            {
                "publisher": _text(_first(df, "b")),
                "place": _text(_first(df, "a")),
                "dateOfPublication": _text(_first(df, "c")),
            }
            for _tag, df in pub_dfs
        ]
    else:
        f008 = (_controlfields(marc, "008") or [""])[0]
        instance["publication"] = [{"dateOfPublication": _text(f008[7:11])}]

    # physicalDescriptions (xsl :274-287)
    phys_dfs = _datafields(marc, {"300"})
    if phys_dfs:
        instance["physicalDescriptions"] = [
            _text(_trim_last(_first(df, "a"), TITLE_TRIM))
            for _tag, df in phys_dfs
        ]

    # subjects (xsl :289-309)
    subj_dfs = _datafields(marc, _SUBJECT_TAGS)
    if subj_dfs:
        instance["subjects"] = [
            _text(
                "--".join(
                    _trim_last(v, NAME_TRIM) for v in _subs(df, _SUBJECT_SUBS)
                )
            )
            for _tag, df in subj_dfs
        ]

    # notes (xsl :311-332): normalize-space of the datafield's string
    # value (concatenated subfield texts — the serializer emits no
    # inter-element whitespace)
    note_dfs = _datafields(marc, {"500", "504", "505", "520"})
    if note_dfs:
        arr = []
        for tag, df in note_dfs:
            raw = "".join(
                v
                for sf in df.get("subfields") or []
                if isinstance(sf, dict)
                for v in sf.values()
            )
            ns = _WS.sub(" ", raw).strip()
            arr.append(
                {
                    "note": _text(ns),
                    "instanceNoteTypeDeref": _NOTE_TYPES.get(tag, "General note"),
                }
            )
        instance["notes"] = arr

    # matchKey (xsl :334-371): every 245 writes the same keys — last wins
    mk = None
    for _tag, df in t245:
        mk = {
            "title": _text(_trim_last(_first(df, "a"), TITLE_TRIM)),
            "remainder-of-title": " : " + _trim_last(_first(df, "b"), TITLE_TRIM),
            "medium": _text(_trim_last(_first(df, "h"), TITLE_TRIM)),
            "name-of-part-section-of-work": _text(_first(df, "p")),
            "number-of-part-section-of-work": _text(_first(df, "n")),
            "inclusive-dates": _text(_first(df, "f")),
        }
    instance["matchKey"] = mk

    return {
        "institutionDerefHere": None,
        "localIdentifier": _text((ids_001 or [""])[0]),
        "instance": instance,
    }


_MATERIAL_BL = {"s": "CNR - Continuing Resources", "b": "CNR - Continuing Resources"}
_MATERIAL_MT = {
    "a": "BKS - Books", "t": "BKS - Books",
    "m": "COM - Computer Files",
    "e": "MAP - Maps", "f": "MAP - Maps",
    "c": "SCO - Scores", "d": "SCO - Scores",
    "i": "REC - Sound Recordings", "j": "REC - Sound Recordings",
    "g": "VIS - Visual Materials",
    "p": "MIX - Mixed Materials",
}


def _material_type(leader: str) -> str:
    """holdings-items-cst.xsl:72-88 — leader[7] (bib level) first,
    then leader[6] (record type)."""
    bl, mt = leader[7:8], leader[6:7]
    return _MATERIAL_BL.get(bl) or _MATERIAL_MT.get(mt, "Unmapped")


def _holdings_records(marc: dict) -> list:
    """xsl/holdings-items-cst.xsl //marc:record template (:28-105).

    Faithfully ported quirk: the stylesheet computes $preloc as
    ``preceding-sibling::datafield[@tag='999'][1]``, intending the
    nearest preceding 999 — but the JDK's default transformer (XSLTC
    compiled templates, the same javax.xml.transform path the
    reference client uses) evaluates the positional predicate on this
    reverse axis in FORWARD document order, so $preloc is always the
    FIRST 999 of the record (empty for the first 999 itself).  Net
    behavior: only 999s repeating the first 999's location are
    deduped; any other repeated location yields duplicate holdings
    entries.  Verified empirically against the real stylesheet run
    through the driver JVM (tests/test_inventory.py, including a
    sorted-vs-document-order probe)."""
    f999 = [df for _tag, df in _datafields(marc, {"999"})]
    if not f999:
        return [{"permanentLocationDeref": "Unmapped"}]
    mtype = _material_type(marc.get("leader") or "")
    first_l = [_first(df, "l") for df in f999]   # value-of → first node
    all_l = [_subs(df, {"l"}) for df in f999]    # the $loc node-set
    entries = [
        (first_l[i], first_l[0] if i else "", all_l[i], f999[i])
        for i in range(len(f999))
    ]
    out = []
    # Python's sorted is stable like Xalan's xsl:sort, so equal keys
    # keep document order
    for loc, preloc, locs, df in sorted(
        entries, key=lambda e: _collation_key(e[0])
    ):
        if any(v == preloc for v in locs):   # not($loc=$preloc)
            continue
        loc_clean = _WS.sub(" ", loc).strip()
        loc_set = set(locs)
        items = [
            {
                "itemIdentifier": _text(_first(idf, "i")),
                "barcode": _text(_first(idf, "i")),
                "copyNumber": _text(_first(idf, "c")),
                "status": {"name": "Unknown"},
                "permanentLoanTypeDeref": "Can circulate",
                "materialTypeDeref": mtype,
            }
            for idf in f999
            if any(v in loc_set for v in _subs(idf, {"l"}))
        ]
        out.append(
            {
                "permanentLocationDeref": _text(loc_clean),
                "illPolicyDeref": (
                    "Will lend" if loc_clean == "xxxx" else "Will not lend"
                ),
                "callNumber": _text(_first(df, "a")),
                "callNumberTypeDeref": "Library of Congress classification",
                "notes": [
                    {
                        "note": f"Location code: {loc_clean}",
                        "holdingsNoteTypeDeref": "Note",
                        "staffOnly": "true",
                    }
                ],
                "items": items,
            }
        )
    return out


def holdings_items_inventory(marc: dict, record: dict) -> dict:
    """xsl/holdings-items-cst.xsl equivalent: copy the record payload
    and append ``holdingsRecords`` derived from the ORIGINAL MARC (the
    stylesheet reads the marc:record kept under <original> by the
    instance transform; our dict pipeline passes the MARC-in-JSON
    alongside instead of re-parsing it)."""
    out = dict(record)
    out["holdingsRecords"] = _holdings_records(marc)
    return out


def library_codes_cst(obj):
    """xsl/library-codes-cst.xsl equivalent: identity transform that
    resolves the two placeholder markers anywhere in the tree —
    <identifierTypeDerefHere/> → identifierTypeDeref 'ISIL:US-CSt',
    <institutionDerefHere/> → institutionDeref 'US-CSt'."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k == "identifierTypeDerefHere":
                out["identifierTypeDeref"] = "ISIL:US-CSt"
            elif k == "institutionDerefHere":
                out["institutionDeref"] = "US-CSt"
            else:
                out[k] = library_codes_cst(v)
        return out
    if isinstance(obj, list):
        return [library_codes_cst(v) for v in obj]
    return obj


def cst_inventory(marc: dict) -> dict:
    """The full CST ingest chain — marc2inventory-instance.xsl →
    holdings-items-cst.xsl → library-codes-cst.xsl, the repeated
    ``--xsl`` sequence the reference client applies per record
    (Client.java:197-260, IngestRecord.java:52-67) — as one dict
    transform producing instance + holdingsRecords + resolved
    institution codes."""
    return library_codes_cst(
        holdings_items_inventory(marc, marc_to_inventory(marc))
    )


def localid_inventory(marc: dict) -> dict:
    """xsl/localid.xsl equivalent: the minimal inventory payload."""
    ids = _controlfields(marc, "001")
    return {"localIdentifier": _text((ids or [""])[0])}


def create_ingest_record(marc: dict) -> dict:
    """IngestRecord.createIngestRecord (IngestRecord.java:22-41):
    {localId, payload: {marc, inventory}}; missing 001 is an error."""
    inv = marc_to_inventory(marc)
    local_id = inv.get("localIdentifier")
    if not local_id:
        raise ValueError("inventory xml: missing record/localIdentifier string")
    return {
        "localId": local_id,
        "payload": {"marc": marc, "inventory": inv},
    }
