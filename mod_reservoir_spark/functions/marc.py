"""MARC-in-JSON access helpers (pure Python, used inside ingest UDFs).

MARC-in-JSON shape (reference util/.../MarcToJsonObjectMapper.java:34-61,
XmlMetadataParserMarcInJson.java:68-117):

    {"leader": "00914naa a22...",
     "fields": [ {"001": "a1"},
                 {"245": {"ind1": "1", "ind2": "0",
                          "subfields": [{"a": "Title"}, {"b": "sub"}]}} ]}

`fields` is an ordered array of single-key objects (tags repeat);
subfields likewise. These helpers mirror the semantics the reference
relies on: 001 → localId, leader[5]=='d' → delete tombstone, 004
present → holdings record (MarcJsonToIngestMapper.java:27-41).
"""

from __future__ import annotations

DEFAULT_LEADER = "00000cam a2200000   4500"


def iter_fields(marc: dict, tag: str | None = None):
    """Yield (tag, value) over the ordered fields array."""
    for f in marc.get("fields") or []:
        if isinstance(f, dict):
            for t, v in f.items():
                if tag is None or t == tag:
                    yield t, v


def get_field(marc: dict, tag: str):
    """First field with the tag (control-field string or datafield dict)."""
    for _, v in iter_fields(marc, tag):
        return v
    return None


def get_subfields(field, code: str) -> list[str]:
    """All values of a subfield code within one datafield dict."""
    if not isinstance(field, dict):
        return []
    out = []
    for sf in field.get("subfields") or []:
        if isinstance(sf, dict) and code in sf:
            out.append(sf[code])
    return out


def first_subfield(field, code: str) -> str | None:
    vals = get_subfields(field, code)
    return vals[0] if vals else None


def local_id(marc: dict) -> str | None:
    """MARC 001 control field, stripped (MarcJsonToIngestMapper.java:36-41)."""
    v = get_field(marc, "001")
    return v.strip() if isinstance(v, str) else None


def is_delete(marc: dict) -> bool:
    """leader[5] == 'd' marks a tombstone (MarcJsonToIngestMapper.java:31-34)."""
    leader = marc.get("leader")
    return isinstance(leader, str) and len(leader) > 5 and leader[5] == "d"


def is_holdings(marc: dict) -> bool:
    """A 004 control field marks an MFHD (holdings) record that attaches
    to the preceding bib (MarcJsonToIngestMapper.java:27-29, 79-88)."""
    return get_field(marc, "004") is not None


def strip_nul(s: str) -> str:
    """NUL bytes break Postgres JSONB in the reference
    (MarcToJsonObjectMapper.java:56-60); reproduced for parity."""
    return s.replace(chr(0), "") if isinstance(s, str) else s
