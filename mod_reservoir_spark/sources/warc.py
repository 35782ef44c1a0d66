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


def _record_from_block(fields: dict, block: bytes) -> dict:
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
    return {
        "warc_type": wtype,
        "record_id": fields.get("warc-record-id", ""),
        "target_uri": fields.get("warc-target-uri", ""),
        "warc_date": fields.get("warc-date", ""),
        "content_type": fields.get("content-type", ""),
        "http_status": status,
        "payload": payload,
    }


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield dicts per WARC record: warc_type, record_id, target_uri,
    warc_date, content_type, http_status (response records, else
    None), payload (block with HTTP headers stripped for responses).
    Lenient: stops at the first unparseable boundary, including a
    TRUNCATED tail record (crawl archives routinely end mid-record).

    Frames INCREMENTALLY from a streaming GzipFile over the raw bytes
    (ADVICE r4): the archive is never decompressed into one buffer, so
    peak memory is the compressed input plus the current record — for
    a ~1 GB crawl archive that is ~1 GB instead of the 4-5 GB a full
    decompress held. Concatenated per-record gzip members (the spec's
    recommended .warc.gz layout) read natively as one stream."""
    raw = io.BytesIO(data)
    stream = (
        gzip.GzipFile(fileobj=raw) if data[:2] == b"\x1f\x8b" else raw
    )
    try:
        while True:
            line = stream.readline()
            # skip inter-record blank lines
            while line in (CRLF, b"\n"):
                line = stream.readline()
            if not line or not line.startswith(b"WARC/"):
                return
            fields: dict = {}
            while True:
                ln = stream.readline()
                if ln in (CRLF, b"\n", b""):
                    break
                text = ln.decode("utf-8", "replace").rstrip("\r\n")
                if ":" in text:
                    k, v = text.split(":", 1)
                    fields[k.strip().lower()] = v.strip()
            try:
                length = int(fields.get("content-length", ""))
            except ValueError:
                return
            if length < 0:
                # never trust a negative length from crawl data
                return
            block = stream.read(length)
            if len(block) < length:
                # truncated tail record — degrade, never a task failure
                return
            yield _record_from_block(fields, block)
    except (EOFError, OSError, gzip.BadGzipFile):
        # truncated / corrupt gzip member mid-stream: stop cleanly
        return


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
        # once): framing is streaming (parse_warc never materializes
        # the decompressed archive), so peak task memory is the
        # COMPRESSED content column binaryFile hands us plus
        # chunk_rows records. binaryFile itself still buffers each
        # file's full compressed bytes — the remaining per-archive
        # floor; cc-index selective reads (read_warc_slices) avoid
        # even that when only specific records are wanted.
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


def read_warc_slices(spark, slices):
    """cc-index-driven SELECTIVE reads: fetch only the byte ranges the
    crawl index points at, never scanning whole archives — how a
    100 TB crawl is actually queried (the Common Crawl columnar/CDX
    index gives (filename, offset, length) per captured URL; each
    record of a spec-conformant .warc.gz is its own gzip member, so a
    range read decompresses independently).

    ``slices`` is a DataFrame (path string, offset long, length long)
    — e.g. the relevant columns of a cc-index query result joined to
    local mirror paths. Output schema matches :func:`read_warc` with
    ``seq`` = slice byte offset + record ordinal within the slice
    (unique per file even when one slice spans multiple records).

    Scale shape: the slice table is the thing that shuffles (tiny —
    index rows, not archives); each task opens its files, seeks, and
    reads ``length`` bytes per record. On an object store the same
    pattern is a ranged GET. Missing files / bad ranges degrade to no
    rows, never task failures.
    """
    import pandas as pd

    cols = [
        "file", "seq", "warc_type", "record_id", "target_uri",
        "warc_date", "content_type", "http_status", "payload",
    ]

    def fetch(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                # binaryFile (and so warc_index) reports file: URIs;
                # local open wants a plain path. Object-store URIs
                # would dispatch to a ranged GET here instead.
                path = row["path"]
                if path.startswith("file:"):
                    path = path[5:]
                try:
                    with open(path, "rb") as f:
                        f.seek(int(row["offset"]))
                        raw = f.read(int(row["length"]))
                except OSError:
                    continue
                # seq = slice offset + record ordinal within the
                # slice: every record is >1 byte, so offset+i is
                # strictly below the NEXT record's own byte offset —
                # unique per file even when a cc-index slice spans
                # several records.
                for i, rec in enumerate(parse_warc(raw)):
                    out.append(
                        {"file": row["path"], "seq": int(row["offset"]) + i, **rec}
                    )
            yield pd.DataFrame(out, columns=cols)

    return slices.select("path", "offset", "length").mapInPandas(
        fetch,
        schema=(
            "file string, seq long, warc_type string, record_id string,"
            " target_uri string, warc_date string, content_type string,"
            " http_status long, payload binary"
        ),
    )


def warc_index(spark, path):
    """Build the (path, offset, length, target_uri, warc_type) record
    index for local archives — the cc-index stand-in when none ships
    with the data: one full scan produces the index, after which every
    later query uses :func:`read_warc_slices` range reads.

    Offsets are exact member boundaries for per-record-gzip archives
    (each record = one gzip member, measured from the compressed
    stream) and record boundaries for uncompressed ones.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def index(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                for off, ln, fields in _member_offsets(data):
                    out.append(
                        {
                            "path": row["path"],
                            "offset": off,
                            "length": ln,
                            "target_uri": fields.get("warc-target-uri", ""),
                            "warc_type": fields.get("warc-type", ""),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "path", "offset", "length", "target_uri", "warc_type",
                ],
            )

    return files.select("path", "content").mapInPandas(
        index,
        schema=(
            "path string, offset long, length long, target_uri string,"
            " warc_type string"
        ),
    )


_FEED_CHUNK = 1 << 20  # compressed bytes per decompressor feed


def _member_offsets(data: bytes):
    """(offset, length, header_fields) per record. For gzip input the
    offsets delimit gzip MEMBERS in the compressed stream (requires
    the spec's record-per-member layout); uncompressed input yields
    record boundaries.

    O(archive) total, NOT O(records^2): the compressed bytes are
    wrapped in a memoryview and each member's decompressor is fed
    bounded slices of it until ``eof`` — never ``data[start:]`` (which
    copies the whole remainder per member) and never one big feed
    (whose ``unused_data`` would be the same copy on the way out). A
    record-per-member archive with 100k members advances a cursor
    instead of moving O(R^2) bytes."""
    if data[:2] == b"\x1f\x8b":
        import zlib

        view = memoryview(data)
        n = len(data)
        start = 0
        while True:
            try:
                if n - start < 2 or bytes(view[start : start + 2]) != b"\x1f\x8b":
                    return
                # one fresh decompressor per member: eof + unused_data
                # mark the exact compressed member boundary. Feed in
                # _FEED_CHUNK slices so unused_data is at most one
                # chunk, not the rest of the archive.
                d = zlib.decompressobj(wbits=31)
                head = b""  # only the header matters for the index;
                # retain at most 64 KiB of decompressed bytes/member
                pos = start
                while not d.eof and pos < n:
                    upto = min(pos + _FEED_CHUNK, n)
                    part = d.decompress(view[pos:upto])
                    if len(head) < 65536:
                        head += part
                    pos = upto
                if not d.eof:
                    return  # truncated final member
                consumed = (pos - start) - len(d.unused_data)
                fields = _head_fields(head)
                if fields is None:
                    return
                yield start, consumed, fields
                start += consumed
                if start >= n:
                    return
            except (EOFError, OSError, zlib.error):
                return
    else:
        yield from _plain_offsets(data)


def _head_fields(buf: bytes) -> dict | None:
    end = buf.find(CRLF + CRLF)
    if end < 0 or not buf.startswith(b"WARC/"):
        return None
    fields = {}
    for ln in buf[:end].split(CRLF)[1:]:
        text = ln.decode("utf-8", "replace")
        if ":" in text:
            k, v = text.split(":", 1)
            fields[k.strip().lower()] = v.strip()
    return fields


def _plain_offsets(data: bytes):
    # cursor + bounded header slices only — no data[pos:] remainder
    # copies (the same O(R^2) hazard as the gzip path)
    pos = 0
    n = len(data)
    while pos < n:
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n or data[pos : pos + 5] != b"WARC/":
            return
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        fields = _head_fields(data[pos : head_end + 4])
        if fields is None:
            return
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            return
        if length < 0:
            return
        end = head_end + 4 + length
        if end > n:
            return
        yield pos, end - pos, fields
        pos = end
