"""Built-in export transformers.

The reference ships one transformer module, marc-transformer
(js/transformers/marc-transformer.mjs:1-30), served to its module tests
as ModuleScripts.TEST_SCRIPT_1 and asserted field-by-field in
ModuleTest.java:113-200. Contract (ClusterRecordStream.java:88-127):
cluster in, one merged MARC-in-JSON record out, used as the exported
metadata at OAI time.

Semantics ported exactly: leader becomes 'new leader'; every member's
marc fields are concatenated in member order; after each member's
fields a 999 field (ind1='1', ind2='0') is stamped with subfields
$i globalId, $l localId, $s sourceId.
"""

from __future__ import annotations


def marc_transformer(cluster: dict) -> dict:
    """Merge all member MARC records, stamping a 999 per member."""
    out: dict = {"leader": "new leader", "fields": []}
    for rec in cluster.get("records", []):
        marc = (rec.get("payload") or {}).get("marc") or {}
        out["fields"].extend(marc.get("fields", []))
        out["fields"].append(
            {
                "999": {
                    "ind1": "1",
                    "ind2": "0",
                    "subfields": [
                        {"i": rec.get("globalId")},
                        {"l": rec.get("localId")},
                        {"s": rec.get("sourceId")},
                    ],
                }
            }
        )
    return out
