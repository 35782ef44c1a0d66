"""WARC source — read web-crawl archives (ISO 28500, the Common
Crawl / Heritrix format) into a DataFrame, so the curation pipeline
starts where real web data starts: WARC → extract_html_text → curate.

Format (public spec): a WARC file is a sequence of records, each a
``WARC/1.0`` version line, CRLF header lines (``Name: value``), a
blank line, ``Content-Length`` bytes of block, and CRLF CRLF. A
``.warc.gz`` compresses EACH RECORD as its own gzip member
(concatenated members — the spec's recommendation so readers can seek);
Python's gzip reads concatenated members natively, so one decompress
pass handles both per-record and whole-file compression.

Spark shape: the same pattern as the ISO2709 source —
``binaryFile`` (one row per archive; crawl datasets ship thousands of
~1 GB files, so files are the natural parallel unit) → ``mapInPandas``
framing + parse in Python → one row per record. For ``response``
records the HTTP headers are split off the payload and the status code
extracted, so downstream sees the body bytes directly. Malformed
trailing data degrades to "no more records", never a task failure.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

CRLF = b"\r\n"


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members (per-record .warc.gz) read as one
        # stream under Python's gzip
        return gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    return data


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield dicts per WARC record: warc_type, record_id, target_uri,
    warc_date, content_type, http_status (response records, else
    None), payload (block with HTTP headers stripped for responses).
    Lenient: stops at the first unparseable boundary."""
    buf = _maybe_gunzip(data)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and buf[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        head_end = buf.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        head = buf[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            return
        fields = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            # a negative length would move pos BACKWARDS and loop the
            # parser on the same malformed record forever — crawl data
            # is exactly where corrupt bytes appear, so stop here
            return
        block_start = head_end + 4
        block = buf[block_start : block_start + length]
        pos = block_start + length
        wtype = fields.get("warc-type", "")
        payload = block
        status = None
        if wtype == "response" and block[:5] in (b"HTTP/", b"http/"):
            # strip the HTTP response envelope; keep the body
            hdr_end = block.find(CRLF + CRLF)
            if hdr_end >= 0:
                status_line = block[: block.find(CRLF)].decode(
                    "utf-8", "replace"
                )
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                payload = block[hdr_end + 4 :]
        yield {
            "warc_type": wtype,
            "record_id": fields.get("warc-record-id", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "content_type": fields.get("content-type", ""),
            "http_status": status,
            "payload": payload,
        }


def read_warc(spark, path: str):
    """DataFrame of WARC records: (file, seq, warc_type, record_id,
    target_uri, warc_date, content_type, http_status, payload binary).
    Feed ``response`` rows' payloads (decoded as text) to
    extract_html_text for the web curation funnel."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    cols = [
        "file", "seq", "warc_type", "record_id", "target_uri",
        "warc_date", "content_type", "http_status", "payload",
    ]
    chunk_rows = 2000

    def decode(batches):
        # yield in bounded chunks (never the whole archive set at
        # once): peak task memory is the one decompressed buffer the
        # framing needs plus chunk_rows records — not 3-4x the archive
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for i, rec in enumerate(parse_warc(bytes(row["content"]))):
                    out.append({"file": row["path"], "seq": i, **rec})
                    if len(out) >= chunk_rows:
                        yield pd.DataFrame(out, columns=cols)
                        out = []
            if out:
                yield pd.DataFrame(out, columns=cols)

    return files.select("path", "content").mapInPandas(
        decode,
        schema=(
            "file string, seq long, warc_type string, record_id string,"
            " target_uri string, warc_date string, content_type string,"
            " http_status long, payload binary"
        ),
    )


def read_wet(spark, path: str):
    """Common Crawl WET convenience reader: WET files are WARC
    archives whose ``conversion`` records carry ALREADY-EXTRACTED
    plain text as the payload — the usual starting point when the
    HTML-extraction stage is outsourced to the crawl provider. Returns
    document-shaped rows (file, seq, target_uri, warc_date, text)
    ready for the text/dedup/curation operators; pair with
    ``extract_html_text`` over ``read_warc`` response records when you
    want the extraction under your own control."""
    from pyspark.sql import functions as F

    return (
        read_warc(spark, path)
        .filter(F.col("warc_type") == "conversion")
        .select(
            "file",
            "seq",
            "target_uri",
            "warc_date",
            F.col("payload").cast("string").alias("text"),
        )
    )
