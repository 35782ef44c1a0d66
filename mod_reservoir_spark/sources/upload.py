"""Mixed-format upload batches — the reference's multipart upload.

The reference's upload endpoint (server/.../UploadService.java:59-128)
accepts a multipart request whose parts carry their own content types
and dispatches each part to the ISO2709 parser
(application/octet-stream, application/marc) or the MARCXML parser
with optional XML fixer (application/xml, text/xml), feeding one
ingest stream.

Spark shape: the part set is a file batch; `binaryFile` gives one row
per file and the per-file dispatch happens INSIDE the decode task by
content sniff (gzip unwrapped first, BOM tolerated) — so a mixed
upload is one distributed job, files are the parallel unit, and no
driver-side loop touches the bytes. `upload_batch` is the endpoint
analog: decode → ingest → stats.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from mod_reservoir_spark.sources.iso2709 import _maybe_gunzip, parse_iso2709
from mod_reservoir_spark.sources.marcxml import parse_marcxml

_BOM = b"\xef\xbb\xbf"


def sniff_is_xml(data: bytes) -> bool:
    head = data[len(_BOM):] if data.startswith(_BOM) else data
    return head.lstrip()[:1] == b"<"


def read_marc_upload(spark, path: str, xml_fixing: bool = False):
    """DataFrame of MARC-in-JSON records from a mixed ISO2709/MARCXML
    file batch: (file, seq, marc_json) — same shape as the single-
    format readers, so marc_df_to_ingest applies unchanged."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                data = _maybe_gunzip(row["path"], bytes(row["content"]))
                recs = (
                    parse_marcxml(data, xml_fixing)
                    if sniff_is_xml(data)
                    else parse_iso2709(data)
                )
                for i, rec in enumerate(recs):
                    out.append(
                        {
                            "file": row["path"],
                            "seq": i,
                            "marc_json": json.dumps(rec, ensure_ascii=False),
                        }
                    )
            yield pd.DataFrame(out, columns=["file", "seq", "marc_json"])

    return files.select("path", "content").mapInPandas(
        decode, schema="file string, seq long, marc_json string"
    )


def upload_batch(
    spark,
    warehouse,
    path: str,
    source_id: str,
    configs: list[dict],
    source_version: int = 1,
    xml_fixing: bool = False,
    with_inventory: bool = False,
) -> dict:
    """The upload endpoint analog: decode the mixed batch, ingest, and
    return the reference's stats contract (processed/inserted/updated/
    deleted)."""
    from mod_reservoir_spark.sources.ingest_records import marc_df_to_ingest
    from mod_reservoir_spark.streaming.ingest import ingest_batch

    marc_df = read_marc_upload(spark, path, xml_fixing)
    ingest_df = marc_df_to_ingest(
        marc_df, source_id, source_version, with_inventory=with_inventory
    )
    return ingest_batch(warehouse, ingest_df, configs)
