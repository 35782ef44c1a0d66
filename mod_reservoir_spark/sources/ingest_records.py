"""MARC-in-JSON stream → ingest records.

Re-expresses the reference's MarcJsonToIngestMapper
(util/.../readstream/MarcJsonToIngestMapper.java:49-90):
- localId ← MARC 001, stripped (:36-41)
- delete  ← leader[5] == 'd' (:31-34)
- a record with an 004 control field is an MFHD (holdings) that
  attaches to the PRECEDING bib as payload.marcHoldings[] (:27-29,
  79-88); a holdings record with no preceding bib is an error
- payload = {"marc": bib, "marcHoldings": [...]?}

The grouping is order-dependent within a file, so it runs inside the
per-file decode task (mapInPandas over binaryFile rows) — files are
independent, records within a file are sequential: exactly the
parallelism the data allows.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

from mod_reservoir_spark.functions.marc import is_delete, is_holdings, local_id


class HoldingsWithoutParent(ValueError):
    pass


def group_ingest_records(
    marc_records: Iterable[dict], strict: bool = False
) -> Iterator[dict]:
    """Group bib + trailing holdings; yield ingest dicts:
    {localId, delete, payload: {marc, marcHoldings?}}."""
    current: dict | None = None
    for rec in marc_records:
        if is_holdings(rec):
            if current is None:
                if strict:
                    raise HoldingsWithoutParent(
                        "MFHD record without preceding bibliographic record"
                    )
                continue
            current["payload"].setdefault("marcHoldings", []).append(rec)
            continue
        if current is not None:
            yield current
        current = {
            "localId": local_id(rec),
            "delete": is_delete(rec) or None,
            "payload": {"marc": rec},
        }
    if current is not None:
        yield current


def marc_df_to_ingest(
    marc_df, source_id: str, source_version: int = 1,
    with_inventory: bool | str = False,
):
    """(file, seq, marc_json) DataFrame → ingest-record DataFrame
    (local_id, source_id, source_version, payload, delete). Records
    with no localId are ignored (reference: marc3-no-id.xml case).

    with_inventory=True additionally populates payload.inventory via
    the marc2inventory transform (functions/inventory.py — the
    reference client's XSLT chain, Client.java:197-260), inside the
    same Arrow batch: no extra pass over the data.
    with_inventory="cst" runs the full consortium chain instead
    (instance + holdings-items + library-codes stylesheets), adding
    ``inventory.holdingsRecords``; with_inventory="cst-uuids" runs the
    xsl/uuids variant of that chain (functions/inventory_uuids.py),
    stamping stable FOLIO reference UUIDs and dereferencing relator
    terms to contributor-type ids."""
    import pandas as pd

    def to_ingest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mod_reservoir_spark.functions.inventory import (
            cst_inventory,
            marc_to_inventory,
        )
        from mod_reservoir_spark.functions.inventory_uuids import (
            cst_uuids_inventory,
        )

        transform = {
            "cst": cst_inventory,
            "cst-uuids": cst_uuids_inventory,
        }.get(with_inventory, marc_to_inventory)

        for pdf in batches:
            out = []
            for _, grp in pdf.sort_values("seq").groupby("file", sort=False):
                records = (json.loads(s) for s in grp["marc_json"])
                for ing in group_ingest_records(records):
                    if not ing["localId"]:
                        continue
                    if with_inventory and "inventory" not in ing["payload"]:
                        ing["payload"]["inventory"] = transform(
                            ing["payload"]["marc"]
                        )
                    out.append(
                        {
                            "local_id": ing["localId"],
                            "source_id": source_id,
                            "source_version": source_version,
                            "payload": json.dumps(
                                ing["payload"], ensure_ascii=False
                            ),
                            "delete": bool(ing["delete"]),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "local_id", "source_id", "source_version",
                    "payload", "delete",
                ],
            )

    # repartition by file so each task sees whole files (ordering)
    return marc_df.repartition("file").mapInPandas(
        to_ingest,
        schema=(
            "local_id string, source_id string, source_version int, "
            "payload string, delete boolean"
        ),
    )
