"""GoldRush match key (December2024_0 specification), re-implemented in
Python from the behavior of the reference's JS module
(reference js/matchkeys/goldrush2024/goldrush.mjs:411-443; golden corpus
js/test/assertions-goldrush2024.json pins exact output strings).

The key is 12 fixed-width lowercase components concatenated:
title(70) year(4) pagination(4) edition(3) publisher(5) typeOfRecord(0|1)
titlePart(30) titleNumber(10) author(5) inclusiveDates(15)
GDCN(variable) electronicIndicator(1).

Exposed three ways:
- ``matchkey(payload_json_str)`` — pure-Python, contract-identical to
  the reference module (input ``{"marc": {...}}`` JSON string);
- ``goldrush_udf()`` — Arrow-batched Pandas UDF for the ingest path;
- registered as matcher module ``goldrush::matchkey`` for
  match_key_config rows (see operators/matchkeys.py).

Deviation (documented): for syntactically invalid JSON the reference
surfaces the V8 JSON.parse message; we surface Python's json message —
error TEXT differs, error BEHAVIOR (key = the message string) matches.
"""

from __future__ import annotations

import json
import unicodedata

import pandas as pd
import regex as _re

# ordered punctuation → replaceChar set (goldrush.mjs:84-123): space !
# " # $ ( ) * + , - . / : ; < = > ? @ [ \\ ] ^ _ ` | ~ ©
_PUNCT_CHARS = ' !"#$()*+,-./:;<=>?@[\\]^_`|~©'
_ARTICLE_RES = [
    _re.compile(r"^ *[aA] +"),
    _re.compile(r"^ *[aA]n +"),
    _re.compile(r"^ *[tT]he +"),
]
_DIACRITIC_RE = _re.compile(r"\p{Diacritic}", _re.UNICODE)
_YEAR_RE = _re.compile(r"[1-9][0-9]{3}")

EDITION_WORDS = {
    "fir": "1", "sec": "2", "thi": "3", "fou": "4", "fif": "5",
    "six": "6", "sev": "7", "eig": "8", "nin": "9", "ten": "10",
}

DEFAULT_LEADER = "00000nam a22000000a 4500"


class MarcFieldsMissing(ValueError):
    def __init__(self):
        super().__init__("MARC fields array is missing.")


class MarcFieldsNotArray(ValueError):
    def __init__(self):
        super().__init__("MARC fields is not an array.")


def load_marc_json(record: str) -> dict:
    marc = json.loads(record)["marc"]
    if "fields" not in marc:
        raise MarcFieldsMissing()
    if not isinstance(marc["fields"], list):
        raise MarcFieldsNotArray()
    if not marc.get("leader"):
        marc["leader"] = DEFAULT_LEADER
    return marc


def _fields_with_tag(marc: dict, tag: str) -> list:
    # JS truthiness: fields whose value is falsy ('' / 0 / null) don't count
    return [f[tag] for f in marc["fields"] if isinstance(f, dict) and f.get(tag)]


def has_field(marc: dict, tag: str) -> bool:
    return bool(_fields_with_tag(marc, tag))


def get_field(marc: dict, tag: str, sf: str | None = None):
    """First field with tag; if it carries subfields, the first truthy
    subfield `sf` of THAT field; control fields return their value."""
    fields = _fields_with_tag(marc, tag)
    if not fields:
        return None
    f = fields[0]
    if isinstance(f, dict) and f.get("subfields"):
        for s in f["subfields"]:
            if isinstance(s, dict) and s.get(sf):
                return s[sf]
        return None
    return f


def get_relevant_subfield(marc: dict, tag: str, sf: str):
    """First among the repeating fields of `tag` that has subfield `sf`."""
    for f in _fields_with_tag(marc, tag):
        if isinstance(f, dict) and f.get("subfields"):
            for s in f["subfields"]:
                if isinstance(s, dict) and s.get(sf):
                    return s[sf]
    return None


def get_multi_subfields(marc: dict, tag: str, sf: str) -> list:
    out = []
    for f in _fields_with_tag(marc, tag):
        if isinstance(f, dict) and f.get("subfields"):
            for s in f["subfields"]:
                if isinstance(s, dict) and s.get(sf):
                    out.append(s[sf])
    return out


def strip_punctuation(part: str, replace_char: str) -> str:
    s = part.replace("%22", "_").replace("%", "_")
    for rx in _ARTICLE_RES:
        s = rx.sub("", s, count=1)
    s = s.replace("'", "").replace("{", "").replace("}", "")
    s = s.replace("&", "and")
    for ch in _PUNCT_CHARS:
        s = s.replace(ch, replace_char)
    return s


def normalize_and_unaccent(s):
    if s is None:
        return None
    return _DIACRITIC_RE.sub("", unicodedata.normalize("NFD", s))


def pad_content(part: str, length: int) -> str:
    s = _re.sub(r" +", " ", part).replace(" ", "_")
    return s[:length].ljust(length, "_")


def do_title(parts: list) -> str:
    s = "".join(
        strip_punctuation(p, " ").strip() for p in parts if p is not None
    )
    s = normalize_and_unaccent(s.replace(" ", ""))
    return pad_content(s, 70)


def do_publication_year(parts: list) -> str:
    out = ""
    for n, p in enumerate(parts):
        if p is None:
            continue
        p = str(p)
        if n == 0:
            date_type = p[6:7]
            window = p[7:11] if date_type == "r" else p[11:15]
            digits = _re.sub(r"[^0-9]", "", window)
        else:
            digits = _re.sub(r"[^0-9]", "", p)
        if _YEAR_RE.search(digits) and digits != "9999":
            out = digits
            break
    return pad_content(out or "0000", 4)


def do_pagination(p) -> str:
    out = ""
    if p is not None:
        m = _re.search(r"([0-9]{4})", p)
        if m:
            out = m.group(1)
    return pad_content(out, 4)


def do_edition_statement(p) -> str:
    out = ""
    if p is not None:
        s = normalize_and_unaccent(p).strip()
        for n in (3, 2, 1):
            m = _re.match(r"^([0-9]{%d})" % n, s)
            if m:
                out = m.group(1)
                break
        if not out:
            m = _re.match(r"^([a-zA-Z]{3})", s)
            if m:
                out = EDITION_WORDS.get(m.group(1).lower(), "1")
    return pad_content(out or "1", 3)


def do_publisher_name(parts: list) -> str:
    out = ""
    for n, p in enumerate(parts):
        if p is not None:
            out = normalize_and_unaccent(p).lower()
            if n == 0:
                break
    out = strip_punctuation(out, " ").replace(" ", "")
    return pad_content(out, 5)


def do_type_of_record(leader: str) -> str:
    return leader[6:7] if len(leader) > 10 else ""


def do_title_part(parts: list) -> str:
    out = ""
    for p in parts[1:]:
        s = normalize_and_unaccent(p)
        out += strip_punctuation(s.strip(), "_")[:10]
    return pad_content(out, 30)


def do_title_number(p) -> str:
    out = strip_punctuation(p, "_") if p is not None else ""
    return pad_content(out, 10)


def do_author(parts: list) -> str:
    out = ""
    for p in parts:
        if p is not None:
            out += normalize_and_unaccent(strip_punctuation(p, ""))
    return pad_content(_re.sub(r"[^a-zA-Z0-9]", "", out), 5)


def do_inclusive_dates(p) -> str:
    out = strip_punctuation(p.replace(" ", ""), "_") if p is not None else ""
    return pad_content(out, 15)


def do_gdcn(p) -> str:
    if p is None:
        return ""
    return normalize_and_unaccent(strip_punctuation(p, "_"))[:32000]


def do_electronic_indicator(marc: dict) -> str:
    checks = [
        ("245", "h", r"\belectronic resource\b"),
        ("590", "a", r"\belectronic reproduction\b"),
        ("533", "a", r"\belectronic reproduction\b"),
        ("300", "a", r"\bonline resource\b"),
    ]
    for tag, sf, pattern in checks:
        field = normalize_and_unaccent(get_relevant_subfield(marc, tag, sf))
        if field and _re.search(pattern, field, _re.IGNORECASE):
            return "e"
    f007 = get_field(marc, "007")
    if f007 and isinstance(f007, str) and f007[:1] == "c":
        return "e"
    f337a = get_field(marc, "337", "a")
    if f337a and isinstance(f337a, str) and f337a[:1] == "c":
        return "e"
    if has_field(marc, "086") and has_field(marc, "856"):
        return "e"
    return "p"


def matchkey(record: str) -> str:
    """payload JSON string ``{"marc": {...}}`` → GoldRush match key."""
    marc = load_marc_json(record)
    key = ""
    key += do_title([
        get_relevant_subfield(marc, "245", "a"),
        get_relevant_subfield(marc, "245", "b"),
        get_relevant_subfield(marc, "245", "p"),
    ])
    key += do_publication_year([
        get_field(marc, "008"),
        get_relevant_subfield(marc, "264", "c"),
        get_relevant_subfield(marc, "260", "c"),
    ])
    key += do_pagination(get_relevant_subfield(marc, "300", "a"))
    key += do_edition_statement(get_relevant_subfield(marc, "250", "a"))
    key += do_publisher_name([
        get_relevant_subfield(marc, "264", "b"),
        get_relevant_subfield(marc, "260", "b"),
    ])
    key += do_type_of_record(marc["leader"])
    key += do_title_part(get_multi_subfields(marc, "245", "p"))
    key += do_title_number(get_relevant_subfield(marc, "245", "n"))
    key += do_author([
        get_field(marc, "100", "a"),
        get_field(marc, "110", "a"),
        get_field(marc, "111", "a"),
        get_field(marc, "130", "a"),
    ])
    key += do_inclusive_dates(get_relevant_subfield(marc, "245", "f"))
    key += do_gdcn(get_relevant_subfield(marc, "086", "a"))
    key += do_electronic_indicator(marc)
    return key.lower()


# ---------------------------------------------------------------------
# GoldRush September-2021 variant (v1.1.0) — reference
# js/matchkeys/goldrush/goldrush.mjs:391-423, golden corpus
# js/test/assertions-goldrush2021.json. Differences from December2024_0:
# getField (first field only) instead of getRelevantSubField; title
# keeps word gaps (spaces → '_' at padding); a 5-wide GMD component
# after the title; publication year tries 008 date2 THEN date1 with no
# dateType branch and accepts any [0-9]{4}; edition statement searches
# digits unanchored, maps the raw first-3 chars, and has NO '1'
# fallback; author is 20 wide from 100/110/111 only (no 130) with '_'
# replacement and no alnum filter.


def do_title_2021(parts: list) -> str:
    s = "".join(
        strip_punctuation(p, " ").strip() for p in parts if p is not None
    )
    s = normalize_and_unaccent(s)  # 2021 keeps spaces; padding maps → '_'
    return pad_content(s, 70)


def do_gmd(p) -> str:
    """General medium designator (245$h) — 2021-only component."""
    out = ""
    if p is not None:
        out = _re.sub(r"[^a-zA-Z0-9]", "", normalize_and_unaccent(p))
    return pad_content(out, 5)


_YEAR_RE_2021 = _re.compile(r"[0-9]{4}")


def do_publication_year_2021(parts: list) -> str:
    out = ""
    for n, p in enumerate(parts):
        if p is None:
            continue
        p = str(p)
        if n == 0:
            digits = _re.sub(r"[^0-9]", "", p[11:15])  # date2 first
            if _YEAR_RE_2021.search(digits) and digits != "9999":
                out = digits
                break
            digits = _re.sub(r"[^0-9]", "", p[7:11])  # then date1
            if _YEAR_RE_2021.search(digits) and digits != "9999":
                out = digits
                break
        else:
            digits = _re.sub(r"[^0-9]", "", p)
            if _YEAR_RE_2021.search(digits) and digits != "9999":
                out = digits
                break
    return pad_content(out or "0000", 4)


def do_edition_statement_2021(p) -> str:
    out = ""
    if p is not None:
        s = normalize_and_unaccent(p)  # no trim in 2021
        for n in (3, 2, 1):
            m = _re.search(r"([0-9]{%d})" % n, s)  # unanchored
            if m:
                out = m.group(1)
                break
        if not out:
            out = EDITION_WORDS.get(s[:3].lower(), "")  # no '1' default
    return pad_content(out, 3)


def do_author_2021(parts: list) -> str:
    out = ""
    for p in parts:
        if p is not None:
            out += normalize_and_unaccent(strip_punctuation(p, "_"))
    return pad_content(out, 20)


def do_electronic_indicator_2021(marc: dict) -> str:
    checks = [
        ("245", "h", r"\belectronic resource\b"),
        ("590", "a", r"\belectronic reproduction\b"),
        ("533", "a", r"\belectronic reproduction\b"),
        ("300", "a", r"\bonline resource\b"),
    ]
    for tag, sf, pattern in checks:
        field = normalize_and_unaccent(get_field(marc, tag, sf))
        if field and _re.search(pattern, field, _re.IGNORECASE):
            return "e"
    f007 = get_field(marc, "007")
    if f007 and isinstance(f007, str) and f007[:1] == "c":
        return "e"
    f337a = get_field(marc, "337", "a")
    if f337a and isinstance(f337a, str) and f337a[:1] == "c":
        return "e"
    if has_field(marc, "086") and has_field(marc, "856"):
        return "e"
    return "p"


def matchkey2021(record: str) -> str:
    """payload JSON string → GoldRush v1.1.0 (September 2021) key."""
    marc = load_marc_json(record)
    key = ""
    key += do_title_2021([
        get_field(marc, "245", "a"),
        get_field(marc, "245", "b"),
        get_field(marc, "245", "p"),
    ])
    key += do_gmd(get_field(marc, "245", "h"))
    key += do_publication_year_2021([
        get_field(marc, "008"),
        get_field(marc, "264", "c"),
        get_field(marc, "260", "c"),
    ])
    key += do_pagination(get_field(marc, "300", "a"))
    key += do_edition_statement_2021(get_field(marc, "250", "a"))
    key += do_publisher_name([
        get_field(marc, "264", "b"),
        get_field(marc, "260", "b"),
    ])
    key += do_type_of_record(marc["leader"])
    key += do_title_part(get_multi_subfields(marc, "245", "p"))
    key += do_title_number(get_field(marc, "245", "n"))
    key += do_author_2021([
        get_field(marc, "100", "a"),
        get_field(marc, "110", "a"),
        get_field(marc, "111", "a"),
    ])
    key += do_inclusive_dates(get_field(marc, "245", "f"))
    key += do_gdcn(get_field(marc, "086", "a"))
    key += do_electronic_indicator_2021(marc)
    return key.lower()


def matchkey2021_or_error(record: str) -> str:
    try:
        return matchkey2021(record)
    except Exception as e:  # noqa: BLE001
        return str(e)


def goldrush2021_keys(payload_obj: dict) -> list[str]:
    """Matcher-module contract — registered as ``goldrush2021::matchkey``
    for tenants pinned to the September-2021 specification."""
    return [matchkey2021(json.dumps(payload_obj))]


def matchkey_or_error(record: str) -> str:
    """Contract of the reference's test harness: invalid inputs yield
    the error message as the key string (js/test/goldrush2024.mjs)."""
    try:
        return matchkey(record)
    except Exception as e:  # noqa: BLE001
        return str(e)


def goldrush_keys(payload_obj: dict) -> list[str]:
    """Matcher-module contract (payload dict in, key collection out) —
    registered as ``goldrush::matchkey``."""
    return [matchkey(json.dumps(payload_obj))]


def goldrush_udf():
    from pyspark.sql import functions as F, types as T

    @F.pandas_udf(T.StringType())
    def gr(payload: pd.Series) -> pd.Series:
        return payload.map(
            lambda s: matchkey_or_error(s) if s is not None else None
        )

    return gr
