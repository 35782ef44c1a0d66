"""MARC → FOLIO-inventory payload, UUID profile.

Python equivalent of the reference's consortium UUID stylesheet chain
(xsl/uuids/marc2inventory-instance.xsl + xsl/uuids/
holdings-items-cst-uuids.xsl + xsl/uuids/library-codes-cst-uuids.xsl,
importing xsl/uuids/map-relator-to-contributor-type.xsl) — the
variant that stamps stable FOLIO reference-record UUIDs
(instanceTypeId, identifierTypeId, materialTypeId, permanentLocationId
…) instead of the human-readable ``*Deref`` names produced by
:mod:`mod_reservoir_spark.functions.inventory`. Each transform mirrors
its stylesheet 1:1 and is pinned byte-exactly against the REAL
stylesheets run through the driver JVM (tests/test_inventory_uuids.py).

The big relator and location tables are machine-transcribed from the
stylesheets into :mod:`inventory_uuids_data` (see
tools/gen_inventory_uuids.py); the small per-branch UUID maps below are
transcribed inline with the same XSL-oracle pinning.

Faithfully ported quirks shared with the Deref profile: the @tage
typo sending tag 711 to 'Personal name', the XSLTC preceding-sibling
evaluation making $preloc the FIRST 999, empty elements → JSON null.
UUID-profile-specific quirk: the 520 note type id is transcribed
verbatim including the stylesheet's malformed 7-hex-digit first group
('0e2e11b-…'), and the no-999 fallback location marker is the
UPPERCASE 'UNMAPPED' (the Deref profile emits 'Unmapped').
"""

from __future__ import annotations

from mod_reservoir_spark.functions.inventory import (
    NAME_TRIM,
    TITLE_TRIM,
    _WS,
    _collation_key,
    _controlfields,
    _datafields,
    _first,
    _subs,
    _text,
    _trim_last,
)
from mod_reservoir_spark.functions.inventory_uuids_data import (
    INSTITUTION_ID,
    LIBRARY_IDENTIFIER_TYPE_ID,
    LOCATION_DEFAULT_ID,
    LOCATION_IDS,
    RELATOR_DEFAULT,
    RELATOR_WHENS,
)

# xsl/uuids/marc2inventory-instance.xsl:40-55 (leader[6] → instance
# type UUID; manuscript variants collapse onto the same ids)
_INSTANCE_TYPE_ID = {
    "a": "6312d172-f0cf-40f6-b27d-9fa8feaf332f",  # text
    "c": "497b5090-3da2-486c-b57f-de5bb3c2e26d",  # notated music
    "d": "497b5090-3da2-486c-b57f-de5bb3c2e26d",
    "e": "526aa04d-9289-4511-8866-349299592c18",  # cartographic image
    "f": "a2c91e87-6bab-44d6-8adb-1fd02481fc4f",  # other
    "g": "535e3160-763a-42f9-b0c0-d8ed7df6e2a2",  # still image
    "i": "9bce18bd-45bf-4949-8fa8-63163e4b7d7f",  # sounds
    "j": "3be24c14-3551-4180-9292-26a786649c8b",  # performed music
    "k": "a2c91e87-6bab-44d6-8adb-1fd02481fc4f",
    "m": "df5dddff-9c30-4507-8b82-119ff972d4d7",  # computer dataset
    "o": "a2c91e87-6bab-44d6-8adb-1fd02481fc4f",
    "p": "a2c91e87-6bab-44d6-8adb-1fd02481fc4f",
    "r": "c1e95c2b-4efc-48cf-9e71-edb622cf0c22",  # 3-d form
    "t": "6312d172-f0cf-40f6-b27d-9fa8feaf332f",
}
_INSTANCE_TYPE_OTHER = "a2c91e87-6bab-44d6-8adb-1fd02481fc4f"

# xsl/uuids/marc2inventory-instance.xsl:74-118 (tag → identifier type)
_IDENTIFIER_TYPE_IDS = {
    "010": "c858e4f2-2b6b-4385-842b-60732ee14abb",  # LCCN
    "020": "8261054f-be78-422d-bd51-4ed9f33c3422",  # ISBN
    "022": "913300b2-03ed-469a-8179-c1092c991227",  # ISSN
    "024": "2e8b3b6c-0e7d-4e48-bca2-b0b23b376af5",  # Other standard
    "028": "b5d8cdc4-9441-487c-90cf-0c7ec97728eb",  # Publisher number
    "035": "7e591197-f335-4afb-bc6d-a6d76ca3bace",  # System control
    "074": "351ebc1c-3aae-4825-8765-c6d50dbf011f",  # GPO item number
}

# xsl/uuids/marc2inventory-instance.xsl:132-158
_CLASSIFICATION_TYPE_IDS = {
    "050": "ce176ace-a53e-4b4d-aa89-725ed7b2edac",  # LC
    "082": "42471af9-7d25-4f3a-bf78-60d29dcf463b",  # Dewey
    "086": "9075b5f8-7d97-49e1-a431-73fdd468d476",  # SUDOC
}

# xsl/uuids/marc2inventory-instance.xsl:202-214
_NAME_TYPE_PERSONAL = "2b94c631-fca9-4892-a730-03ee529ffe2a"
_NAME_TYPE_CORPORATE = "2e48e713-17f3-4c13-a9f8-23845bb210aa"
_NAME_TYPE_MEETING = "e8b311a6-3b21-43f2-a269-dd9310cb2d0a"

# xsl/uuids/marc2inventory-instance.xsl:322-327 — the 520 id is the
# stylesheet's literal text, a malformed uuid (7-digit first group)
_NOTE_TYPE_IDS = {
    "504": "86b6e817-e1bc-42fb-bab0-70e7547de6c1",
    "505": "5ba8e385-0e27-462e-a571-ffa1fa34ea54",
    "520": "0e2e11b-450f-45c8-b09b-0f819999966e",
}
_NOTE_TYPE_GENERAL = "6a2533a7-4de2-4e64-8466-074c2fa9308c"

# xsl/uuids/holdings-items-cst-uuids.xsl
_ILL_POLICY_ID = "46970b40-918e-47a4-a45d-b1677a2d3d46"  # both branches
_CALL_NUMBER_TYPE_ID = "95467209-6d7b-468b-94df-0f5d7ad2747d"  # LC
_HOLDINGS_NOTE_TYPE_ID = "b160f13a-ddba-4053-b9c4-60ec5ea45d56"
_LOAN_TYPE_ID = "2b94c631-fca9-4892-a730-03ee529ffe27"  # Can circulate
_MATERIAL_BL_ID = {
    "s": "191da404-dec2-4977-9770-1443d9d6c238",  # CNR
    "b": "191da404-dec2-4977-9770-1443d9d6c238",
}
_MATERIAL_MT_ID = {
    "a": "e65ed344-a691-4f8f-8446-3c0a346c6882",  # BKS
    "t": "e65ed344-a691-4f8f-8446-3c0a346c6882",
    "m": "22cb5b81-2056-46ed-8050-c5d8f01caf90",  # COM
    "e": "9f2c8d85-97e6-4722-a67c-bb51ccfb7781",  # MAP
    "f": "9f2c8d85-97e6-4722-a67c-bb51ccfb7781",
    "c": "e5578a7e-49b9-4859-a86a-21b812215b4f",  # SCO
    "d": "e5578a7e-49b9-4859-a86a-21b812215b4f",
    "i": "d8dc9046-a9f4-4789-adf5-678fd855b016",  # REC
    "j": "d8dc9046-a9f4-4789-adf5-678fd855b016",
    "g": "14f1845d-2fad-4091-80c8-48614eaea40b",  # VIS
    "p": "bdfc300b-8a03-4ae6-b42a-6243afa0b7b1",  # MIX
}
_MATERIAL_OTHER_ID = "f6dd0721-5d4a-439e-9205-c71aef39d15b"  # Unmapped

_CONTRIB_TAGS = ("100", "110", "111", "700", "710", "711")
_CONTRIB_SUBS = set("abcdfgjklnpqtu")
_SUBJECT_TAGS = {
    "600", "610", "611", "630", "648", "650", "651", "653", "654",
    "655", "656", "657", "658", "662", "69X",
}
_SUBJECT_SUBS = set("abcdfgjklnpqtuvxyz")


def map_relator(df: dict) -> str:
    """xsl/uuids/map-relator-to-contributor-type.xsl map-relator
    template: one xsl:choose over 536 whens — the FIRST branch whose
    (subfield code, value) matches ANY subfield of the datafield wins;
    no match falls to the 'contributor' uuid. Branch order is
    semantic for fields carrying several relator terms, so the
    transcription preserves it."""
    e_vals = set(_subs(df, {"e"}))
    four_vals = set(_subs(df, {"4"}))
    by_code = {"e": e_vals, "4": four_vals}
    for code, values, uuid in RELATOR_WHENS:
        have = by_code[code]
        if have and not have.isdisjoint(values):
            return uuid
    return RELATOR_DEFAULT


def marc_to_inventory_uuids(marc: dict) -> dict:
    """MARC-in-JSON dict → the inventoryPayload the reference produces
    from xsl/uuids/marc2inventory-instance.xsl + InventoryToXml —
    identical structure to
    :func:`mod_reservoir_spark.functions.inventory.marc_to_inventory`
    with ``*Id`` keys carrying FOLIO UUIDs."""
    leader = marc.get("leader") or ""
    instance: dict = {
        "source": "MARC",
        "instanceTypeId": _INSTANCE_TYPE_ID.get(
            leader[6:7], _INSTANCE_TYPE_OTHER
        ),
    }

    ids_001 = _controlfields(marc, "001")
    id_dfs = _datafields(marc, set(_IDENTIFIER_TYPE_IDS) | {"001"})
    if ids_001 or _datafields(marc, set(_IDENTIFIER_TYPE_IDS)):
        arr: list = []
        for v in ids_001:
            arr.append({"value": _text(v), "identifierTypeIdHere": None})
        for tag, df in id_dfs:
            a = _first(df, "a")
            if tag in _IDENTIFIER_TYPE_IDS and _subs(df, {"a"}):
                arr.append(
                    {
                        "value": _text(a),
                        "identifierTypeId": _IDENTIFIER_TYPE_IDS[tag],
                    }
                )
            else:
                arr.append(None)
        instance["identifiers"] = arr

    cls_dfs = _datafields(marc, {"050", "060", "080", "082", "086", "090"})
    if cls_dfs:
        arr = []
        for tag, df in cls_dfs:
            if tag in ("050", "082"):
                num = "; ".join(_subs(df, {"a", "b"}))
                arr.append(
                    {
                        "classificationNumber": _text(num),
                        "classificationTypeId": _CLASSIFICATION_TYPE_IDS[tag],
                    }
                )
            elif tag == "086":
                arr.append(
                    {
                        "classificationNumber": _text(_first(df, "a")),
                        "classificationTypeId": _CLASSIFICATION_TYPE_IDS[tag],
                    }
                )
            else:
                arr.append(None)
        instance["classifications"] = arr

    t245 = _datafields(marc, {"245"})
    title = ""
    if t245:
        title = _trim_last(
            " ".join(_subs(t245[0][1], set("abhnp"))), TITLE_TRIM
        )
    instance["title"] = _text(title)

    contrib_dfs = _datafields(marc, set(_CONTRIB_TAGS))
    if contrib_dfs:
        arr = []
        for tag, df in contrib_dfs:
            name = ", ".join(
                _trim_last(v, NAME_TRIM) for v in _subs(df, _CONTRIB_SUBS)
            )
            i: dict = {"name": _text(name)}
            if tag in ("100", "700"):
                i["contributorNameTypeId"] = _NAME_TYPE_PERSONAL
                if tag == "100":
                    i["primary"] = "true"
            elif tag in ("110", "710"):
                i["contributorNameTypeId"] = _NAME_TYPE_CORPORATE
            elif tag == "111":
                i["contributorNameTypeId"] = _NAME_TYPE_MEETING
            else:  # 711: the @tage typo → otherwise branch
                i["contributorNameTypeId"] = _NAME_TYPE_PERSONAL
            if _subs(df, {"e", "4"}):
                i["contributorTypeId"] = map_relator(df)
            arr.append(i)
        instance["contributors"] = arr

    ed_dfs = _datafields(marc, {"250"})
    if ed_dfs:
        arr = []
        for _tag, df in ed_dfs:
            s = _first(df, "a")
            if _subs(df, {"b"}):
                s += "; " + _first(df, "b")
            arr.append(_text(s))
        instance["editions"] = arr

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

    phys_dfs = _datafields(marc, {"300"})
    if phys_dfs:
        instance["physicalDescriptions"] = [
            _text(_trim_last(_first(df, "a"), TITLE_TRIM))
            for _tag, df in phys_dfs
        ]

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
                    "instanceNoteTypeId": _NOTE_TYPE_IDS.get(
                        tag, _NOTE_TYPE_GENERAL
                    ),
                }
            )
        instance["notes"] = arr

    mk = None
    for _tag, df in t245:
        mk = {
            "title": _text(_trim_last(_first(df, "a"), TITLE_TRIM)),
            "remainder-of-title": " : "
            + _trim_last(_first(df, "b"), TITLE_TRIM),
            "medium": _text(_trim_last(_first(df, "h"), TITLE_TRIM)),
            "name-of-part-section-of-work": _text(_first(df, "p")),
            "number-of-part-section-of-work": _text(_first(df, "n")),
            "inclusive-dates": _text(_first(df, "f")),
        }
    instance["matchKey"] = mk

    return {
        "institutionIdHere": None,
        "localIdentifier": _text((ids_001 or [""])[0]),
        "instance": instance,
    }


def _material_type_id(leader: str) -> str:
    bl, mt = leader[7:8], leader[6:7]
    return _MATERIAL_BL_ID.get(bl) or _MATERIAL_MT_ID.get(
        mt, _MATERIAL_OTHER_ID
    )


def _holdings_records_uuids(marc: dict) -> list:
    """xsl/uuids/holdings-items-cst-uuids.xsl //marc:record template —
    same structure (and same XSLTC $preloc quirk) as the Deref port in
    inventory._holdings_records, with UUID-valued ``*Id`` keys and the
    location code left under ``permanentLocationIdHere`` for the
    library-codes pass to dereference."""
    f999 = [df for _tag, df in _datafields(marc, {"999"})]
    if not f999:
        return [{"permanentLocationIdHere": "UNMAPPED"}]
    mtype = _material_type_id(marc.get("leader") or "")
    first_l = [_first(df, "l") for df in f999]
    all_l = [_subs(df, {"l"}) for df in f999]
    entries = [
        (first_l[i], first_l[0] if i else "", all_l[i], f999[i])
        for i in range(len(f999))
    ]
    out = []
    for loc, preloc, locs, df in sorted(
        entries, key=lambda e: _collation_key(e[0])
    ):
        if any(v == preloc for v in locs):
            continue
        loc_clean = _WS.sub(" ", loc).strip()
        loc_set = set(locs)
        items = [
            {
                "itemIdentifier": _text(_first(idf, "i")),
                "barcode": _text(_first(idf, "i")),
                "copyNumber": _text(_first(idf, "c")),
                "status": {"name": "Unknown"},
                "permanentLoanTypeId": _LOAN_TYPE_ID,
                "materialTypeId": mtype,
            }
            for idf in f999
            if any(v in loc_set for v in _subs(idf, {"l"}))
        ]
        out.append(
            {
                "permanentLocationIdHere": _text(loc_clean),
                "illPolicyId": _ILL_POLICY_ID,
                "callNumber": _text(_first(df, "a")),
                "callNumberTypeId": _CALL_NUMBER_TYPE_ID,
                "notes": [
                    {
                        "note": f"Location code: {loc_clean}",
                        "holdingsNoteTypeId": _HOLDINGS_NOTE_TYPE_ID,
                        "staffOnly": "true",
                    }
                ],
                "items": items,
            }
        )
    return out


def holdings_items_inventory_uuids(marc: dict, record: dict) -> dict:
    out = dict(record)
    out["holdingsRecords"] = _holdings_records_uuids(marc)
    return out


def library_codes_cst_uuids(obj):
    """xsl/uuids/library-codes-cst-uuids.xsl equivalent: identity
    transform resolving the placeholder markers anywhere in the tree —
    identifierTypeIdHere → the library identifier-type UUID,
    institutionIdHere → the institution UUID, and
    permanentLocationIdHere → permanentLocationId with the location
    CODE dereferenced through the 83-entry location table (unknown
    codes get the Unmapped UUID)."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            if k == "identifierTypeIdHere":
                out["identifierTypeId"] = LIBRARY_IDENTIFIER_TYPE_ID
            elif k == "institutionIdHere":
                out["institutionId"] = INSTITUTION_ID
            elif k == "permanentLocationIdHere":
                out["permanentLocationId"] = LOCATION_IDS.get(
                    v or "", LOCATION_DEFAULT_ID
                )
            else:
                out[k] = library_codes_cst_uuids(v)
        return out
    if isinstance(obj, list):
        return [library_codes_cst_uuids(v) for v in obj]
    return obj


def cst_uuids_inventory(marc: dict) -> dict:
    """The full UUID consortium chain — xsl/uuids/
    marc2inventory-instance.xsl → holdings-items-cst-uuids.xsl →
    library-codes-cst-uuids.xsl, the --xsl sequence a shared-index
    deployment applies per record — as one dict transform producing
    instance + holdingsRecords with stable FOLIO UUIDs throughout."""
    return library_codes_cst_uuids(
        holdings_items_inventory_uuids(marc, marc_to_inventory_uuids(marc))
    )
