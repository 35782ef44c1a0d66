"""OAI-PMH harvest client: continuous incremental ingest from a remote
repository.

Re-expresses the reference's harvest loop
(server/.../OaiPmhClientService.java:533-736 and
util/.../oai/OaiParserStream.java:88-167):
- paged ListRecords pulls with a resumptionToken loop,
- `from` advanced to the max record datestamp seen (:618-624),
- retry ≤ numberRetries with waitRetries sleep on connection errors
  (:698-711),
- deleted headers become tombstone ingests (OaiParserStream:128-133),
- per-job counters (totalRecords/Inserted/Updated/Deleted).

Spark shape: the HTTP pull is inherently sequential (token chain), so
the loop runs on the driver and hands each page to `ingest_batch`
(the distributed part). State (resumptionToken, from, counters) is a
JSON checkpoint — the Structured-Streaming-source equivalent of
(offset, watermark), restart-safe at page granularity.
"""

from __future__ import annotations

import io
import json
import os
import time
from collections.abc import Callable, Iterator

OAI_NS = "{http://www.openarchives.org/OAI/2.0/}"


def parse_oai_response(data: bytes) -> dict:
    """One OAI-PMH response document → {"records": [...],
    "resumptionToken": str|None, "error": str|None}; each record is
    {"identifier", "datestamp", "deleted", "marc": dict|None}."""
    import xml.etree.ElementTree as ET

    from mod_reservoir_spark.sources.marcxml import parse_marcxml

    root = ET.parse(io.BytesIO(data)).getroot()
    out: dict = {"records": [], "resumptionToken": None, "error": None}
    err = root.find(f"{OAI_NS}error")
    if err is not None:
        out["error"] = err.get("code") or "error"
        return out
    for lst_name in ("ListRecords", "ListIdentifiers", "GetRecord"):
        lst = root.find(f"{OAI_NS}{lst_name}")
        if lst is None:
            continue
        for rec in lst.iter(f"{OAI_NS}record"):
            header = rec.find(f"{OAI_NS}header")
            if header is None:
                continue
            ident = header.findtext(f"{OAI_NS}identifier")
            stamp = header.findtext(f"{OAI_NS}datestamp")
            deleted = header.get("status") == "deleted"
            marc = None
            meta = rec.find(f"{OAI_NS}metadata")
            if meta is not None and len(meta):
                xml_bytes = ET.tostring(meta[0])
                parsed = list(parse_marcxml(xml_bytes))
                marc = parsed[0] if parsed else None
            out["records"].append(
                {
                    "identifier": ident,
                    "datestamp": stamp,
                    "deleted": deleted,
                    "marc": marc,
                }
            )
        tok = lst.findtext(f"{OAI_NS}resumptionToken")
        out["resumptionToken"] = tok or None
    return out


class HarvestState:
    """Checkpointed client state (reference oai_pmh_clients row:
    config + job columns incl. the (stop, owner) fence,
    Storage.java:201-203, OaiPmhClientService.java:371-393)."""

    def __init__(self, path: str):
        self.path = path
        self.data = {
            "resumptionToken": None,
            "from": None,
            "until": None,
            "owner": None,
            "stop": False,
            "counters": {
                "totalRecords": 0,
                "totalInserted": 0,
                "totalUpdated": 0,
                "totalDeleted": 0,
                "totalRequests": 0,
            },
        }
        self.reload()

    def reload(self):
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data.update(json.load(f))

    def save(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f)
        os.replace(tmp, self.path)


def request_stop(state: HarvestState) -> None:
    """Ask the live harvest loop (whoever owns it) to stop at the next
    page boundary — the reference's stop flag (PUT .../stop)."""
    state.reload()
    state.data["stop"] = True
    state.save()


def harvest(
    spark,
    warehouse,
    configs: list[dict],
    fetch: Callable[[dict], bytes],
    state: HarvestState,
    source_id: str = "OAI",
    set_spec: str | None = None,
    number_retries: int = 3,
    wait_retries: float = 10.0,
    max_pages: int | None = None,
    stop: Callable[[], bool] | None = None,
    metadata_prefix: str = "marcxml",
) -> dict:
    """Run the harvest loop until no resumptionToken (or stop()/
    max_pages). `fetch(params) -> bytes` abstracts the HTTP GET, so
    tests and air-gapped runs can inject page sources.

    Owner fencing (reference OaiPmhClientService.java:371-393,
    681-691): starting a harvest stamps a fresh owner token into the
    checkpoint; each page boundary reloads the checkpoint and the loop
    exits silently if another harvester has taken ownership, or idles
    (clearing the flag) if a stop was requested. One live loop per
    checkpoint, guaranteed at page granularity — the same fence the
    reference enforces via its (stop, owner) row."""
    import uuid

    from mod_reservoir_spark.streaming.ingest import ingest_batch

    owner = uuid.uuid4().hex
    state.data["owner"] = owner
    state.data["stop"] = False
    state.save()

    pages = 0
    while True:
        state.reload()
        if state.data.get("owner") != owner:
            break  # another harvester took over — do not touch state
        if state.data.get("stop"):
            state.data["stop"] = False
            state.save()
            break
        if stop is not None and stop():
            break
        params = {"verb": "ListRecords"}
        if state.data["resumptionToken"]:
            params["resumptionToken"] = state.data["resumptionToken"]
        else:
            if state.data["from"]:
                params["from"] = state.data["from"]
            if state.data["until"]:
                params["until"] = state.data["until"]
            if set_spec:
                params["set"] = set_spec
            # The reference client has NO hardcoded default: it takes
            # metadataPrefix purely from the job config via
            # addQueryParameterFromConfig
            # (OaiPmhClientService.java:539-543) and omits the param
            # when unconfigured. Here the default is "marcxml" — the
            # one prefix this engine's own serving face accepts
            # (operators/oai.py) — so self-harvest works out of the
            # box; harvesting an external ILS passes its prefix
            # explicitly (ADVICE r9 #3).
            params["metadataPrefix"] = metadata_prefix

        data = None
        for attempt in range(number_retries + 1):
            try:
                data = fetch(params)
                break
            except ConnectionError:
                if attempt == number_retries:
                    raise
                time.sleep(wait_retries)
        state.data["counters"]["totalRequests"] += 1
        page = parse_oai_response(data)
        if page["error"]:
            if page["error"] == "noRecordsMatch":
                state.data["resumptionToken"] = None
                state.save()
                break
            raise RuntimeError(f"OAI error: {page['error']}")

        rows, max_stamp = [], state.data["from"]
        for rec in page["records"]:
            local = rec["identifier"]
            if rec["marc"] is not None or rec["deleted"]:
                rows.append(
                    (
                        local,
                        source_id,
                        1,
                        json.dumps({"marc": rec["marc"]})
                        if rec["marc"] is not None
                        else None,
                        rec["deleted"],
                    )
                )
            if rec["datestamp"] and (
                max_stamp is None or rec["datestamp"] > max_stamp
            ):
                max_stamp = rec["datestamp"]
        if rows:
            incoming = spark.createDataFrame(
                rows,
                "local_id string, source_id string, source_version int, "
                "payload string, delete boolean",
            )
            stats = ingest_batch(warehouse, incoming, configs)
            c = state.data["counters"]
            c["totalRecords"] += stats["processed"]
            c["totalInserted"] += stats["inserted"]
            c["totalUpdated"] += stats["updated"]
            c["totalDeleted"] += stats["deleted"]

        # merge the fence fields from disk before persisting progress:
        # a takeover or stop requested MID-page must survive this save
        # (the reference's job update writes progress columns only,
        # never the stop/owner fence)
        fence = HarvestState(state.path)
        if fence.data.get("owner") != owner:
            break  # takeover mid-page: discard progress, don't clobber
        state.data["stop"] = fence.data.get("stop", False)
        state.data["resumptionToken"] = page["resumptionToken"]
        if max_stamp:
            state.data["from"] = max_stamp
        state.save()
        pages += 1
        if page["resumptionToken"] is None:
            break
        if max_pages is not None and pages >= max_pages:
            break
    return state.data["counters"]
