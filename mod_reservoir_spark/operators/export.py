"""Incremental export: keyset pagination + resumption tokens.

The reference's OAI-PMH server pages clusters by
`(datestamp, cluster_id)` keyset predicates instead of deep OFFSET
(reference server/.../OaiService.java:150-198, 304-350;
ResumptionToken.java:23-60). Keyset paging is the 100 TB-friendly
choice: with the meta table sorted/partitioned by datestamp the
predicate prunes file ranges, so page N+1 costs the same as page 1.
"""

from __future__ import annotations

import base64

from pyspark.sql import Column, DataFrame, functions as F


def keyset_predicate(
    ts_col: str, id_col: str, from_ts, from_id
) -> Column:
    """(ts, id) >= (from_ts, from_id) lexicographically — the reference's
    `datestamp = $f AND cluster_id >= $i OR datestamp > $f`
    (OaiService.java:170-185)."""
    ts, cid = F.col(ts_col), F.col(id_col)
    return (ts > F.lit(from_ts)) | ((ts == F.lit(from_ts)) & (cid >= F.lit(from_id)))


def keyset_page(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    from_ts=None,
    from_id=None,
    until_ts=None,
    limit: int = 1000,
) -> DataFrame:
    """One export page: ordered by (ts, id), keyset-bounded, limited.
    `until` is inclusive on the timestamp (OAI `until` semantics,
    reference Util.java:26-111)."""
    out = df
    if from_ts is not None:
        out = out.filter(
            keyset_predicate(ts_col, id_col, from_ts, from_id if from_id is not None else "")
        )
    if until_ts is not None:
        out = out.filter(F.col(ts_col) <= F.lit(until_ts))
    return out.orderBy(F.col(ts_col), F.col(id_col)).limit(limit)


def encode_resumption_token(
    from_ts: str, from_id: str, until: str | None = None, set_id: str | None = None
) -> str:
    """base64("from id until set") — reference ResumptionToken.java:23-60.

    EVERY timestamp field is normalized to the space-free T form before
    joining (round-1 bug: only from_ts was, so an until built via
    isoformat(sep=' ') split into two fields on decode, clobbering
    set_id and truncating multi-page until-bounded harvests). Remaining
    fields must not contain the delimiter."""
    fields = [
        from_ts.replace(" ", "T"),
        from_id,
        (until or "").replace(" ", "T"),
        set_id or "",
    ]
    for f in fields[1:]:
        if " " in f:
            raise ValueError(f"resumption-token field contains space: {f!r}")
    raw = " ".join(fields)
    return base64.urlsafe_b64encode(raw.encode()).decode()


def decode_resumption_token(token: str) -> dict:
    raw = base64.urlsafe_b64decode(token.encode()).decode()
    parts = raw.split(" ")
    return {
        "from": parts[0],
        "id": parts[1] if len(parts) > 1 else "",
        "until": parts[2] if len(parts) > 2 and parts[2] else None,
        "set": parts[3] if len(parts) > 3 and parts[3] else None,
    }


def export_page_with_token(
    meta: DataFrame,
    ts_col: str = "datestamp",
    id_col: str = "cluster_id",
    token: str | None = None,
    from_ts=None,
    until_ts=None,
    set_id: str | None = None,
    limit: int = 1000,
) -> tuple[DataFrame, str | None]:
    """Drive one ListRecords-style page; returns (page, next_token).
    next_token is None when the page is the last (fewer than limit+1
    candidate rows remain)."""
    from_id = None
    if token:
        t = decode_resumption_token(token)
        from_ts, from_id, until_ts, set_id = t["from"], t["id"], t["until"], t["set"]
    page = keyset_page(
        meta, ts_col, id_col, from_ts, from_id, until_ts, limit + 1
    ).collect()
    rows, more = page[:limit], page[limit:]
    next_token = None
    if more:
        nxt = more[0]
        next_token = encode_resumption_token(
            str(nxt[ts_col]), str(nxt[id_col]), until_ts and str(until_ts), set_id
        )
    spark = meta.sparkSession
    out = spark.createDataFrame(rows, meta.schema) if rows else meta.limit(0)
    return out, next_token
