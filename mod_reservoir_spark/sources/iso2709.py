"""ISO2709 binary MARC source.

Framing and permissive decode re-expressed from the reference's
behavior (reference util/.../readstream/Marc4jMapper.java:13-95 —
5-digit length prefix framing, tolerate up to 4 junk bytes between
records; decode via marc4j permissive reader) and the MARC→JSON shape
(MarcToJsonObjectMapper.java:34-61 — ordered single-key field objects,
NUL stripped).

Spark shape: ``spark.read.format("binaryFile")`` (one row per file,
whole content) → ``mapInPandas`` framing + decode in Python → one row
per MARC record with the canonical JSON payload string. Scale note:
binaryFile keeps a whole file in one task — the right unit for MARC
dumps, which are many medium files; a single monolithic 1 TB file
should be pre-split upstream (framing requires a sequential scan
anyway because record boundaries are length-prefixed, not aligned).
"""

from __future__ import annotations

from collections.abc import Iterator

from mod_reservoir_spark.functions.marc import strip_nul

FIELD_TERM = 0x1E
RECORD_TERM = 0x1D
SUBFIELD_DELIM = 0x1F
MAX_JUNK = 4  # reference Marc4jMapper framing tolerance


class Iso2709Error(ValueError):
    pass



def _maybe_gunzip(path: str, data: bytes) -> bytes:
    """binaryFile does not decompress; the reference accepts gzip input
    (AsyncCodec.java:22-59, HTTP decompression MainVerticle.java:40-41).
    Sniff by suffix or magic bytes."""
    if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
        import gzip

        return gzip.decompress(data)
    return data

def frame_records(data: bytes) -> Iterator[bytes]:
    """Split a byte stream into raw records by the 5-digit length
    prefix, skipping up to MAX_JUNK garbage bytes between records."""
    pos, n = 0, len(data)
    while pos < n:
        skipped = 0
        while (
            pos < n
            and skipped <= MAX_JUNK
            and not data[pos : pos + 5].isdigit()
        ):
            pos += 1
            skipped += 1
        if pos >= n or skipped > MAX_JUNK:
            return
        length = int(data[pos : pos + 5])
        if length < 24:
            # bad length — resync after next record terminator
            term = data.find(bytes([RECORD_TERM]), pos)
            if term == -1:
                return
            pos = term + 1
            continue
        yield data[pos : pos + length]
        pos += length


def decode_record(raw: bytes) -> dict:
    """One framed ISO2709 record → MARC-in-JSON dict (permissive:
    fall back to scanning field terminators when the directory is
    inconsistent, like marc4j's permissive reader)."""
    leader = raw[:24].decode("ascii", "replace")
    utf8 = len(leader) > 9 and leader[9] == "a"
    if utf8:

        def dec(b: bytes) -> str:
            return strip_nul(b.decode("utf-8", "replace"))

    else:
        # MARC-8 → UTF-8, like the reference's marc4j permissive reader
        # (Marc4jMapper.java:78, convertToUTF8=true).  marc4j rewrites
        # leader[9] to 'a' on conversion — so do we (marc3.xml golden).
        from mod_reservoir_spark.functions.marc8 import marc8_to_unicode

        def dec(b: bytes) -> str:
            return strip_nul(marc8_to_unicode(b))

        if len(leader) >= 10:
            leader = leader[:9] + "a" + leader[10:]

    try:
        base = int(raw[12:17])
    except ValueError:
        base = -1
    fields: list[dict] = []
    directory = []
    if 24 < base <= len(raw):
        dirdata = raw[24 : base - 1]
        ok = len(dirdata) % 12 == 0
        if ok:
            for i in range(0, len(dirdata), 12):
                e = dirdata[i : i + 12]
                try:
                    directory.append(
                        (e[0:3].decode("ascii"), int(e[3:7]), int(e[7:12]))
                    )
                except (ValueError, UnicodeDecodeError):
                    ok = False
                    break
        if not ok:
            directory = []
    if directory:
        body = raw[base:]
        for tag, flen, start in directory:
            chunk = body[start : start + flen]
            chunk = chunk.rstrip(bytes([FIELD_TERM, RECORD_TERM]))
            fields.append(_decode_field(tag, chunk, dec))
    else:
        # permissive fallback: first 0x1E ends the leader+directory,
        # subsequent chunks are fields in directory order
        chunks = raw.split(bytes([FIELD_TERM]))
        dirdata = chunks[0][24:]
        tags = [
            dirdata[i : i + 3].decode("ascii", "replace")
            for i in range(0, max(len(dirdata) - 11, 0), 12)
        ]
        for tag, chunk in zip(tags, chunks[1:]):
            chunk = chunk.rstrip(bytes([RECORD_TERM]))
            fields.append(_decode_field(tag, chunk, dec))
    return {"leader": leader, "fields": fields}


def _decode_field(tag: str, chunk: bytes, dec) -> dict:
    if tag < "010":  # control field
        return {tag: dec(chunk)}
    parts = chunk.split(bytes([SUBFIELD_DELIM]))
    inds = dec(parts[0])
    field: dict = {
        "ind1": inds[0] if len(inds) > 0 else " ",
        "ind2": inds[1] if len(inds) > 1 else " ",
        "subfields": [],
    }
    for sf in parts[1:]:
        if not sf:
            continue
        code = dec(sf[:1])
        field["subfields"].append({code: dec(sf[1:])})
    return {tag: field}


def parse_iso2709(data: bytes) -> Iterator[dict]:
    for raw in frame_records(data):
        yield decode_record(raw)


def read_iso2709(spark, path: str):
    """DataFrame of MARC-in-JSON records from ISO2709 file(s):
    (file, seq, marc_json)."""
    import json

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for i, rec in enumerate(parse_iso2709(_maybe_gunzip(row["path"] if "path" in row else "", bytes(row["content"])))):
                    out.append(
                        {
                            "file": row["path"],
                            "seq": i,
                            "marc_json": json.dumps(rec, ensure_ascii=False),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["file", "seq", "marc_json"]
            )

    return files.select("path", "content").mapInPandas(
        decode, schema="file string, seq long, marc_json string"
    )
