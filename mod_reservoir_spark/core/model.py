"""Canonical table schemas.

Mirrors the reference's relational model (Storage.init(),
reference server/.../Storage.java:134-206) re-typed for Spark:
uuid → string, jsonb → JSON string column (schema-on-read via
get_json_object / from_json; see SURVEY.md §1.2 for why payload stays
an opaque string), timestamp → TimestampType (session TZ pinned UTC).

At 100 TB the physical layout matters more than the logical schema:
- global_records partitioned by source_id (ingest and delete are
  per-source; partition pruning makes source-scoped ops cheap)
- cluster tables sorted/bucketed by cluster_id (assembly joins co-locate)
- cluster_meta sorted by datestamp (incremental export = range scan)
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference Storage.java:62 — Postgres b-tree limit ("< 2704 / 4");
# reproduced for semantic compatibility (match values truncated at 600).
MATCHVALUE_MAX_LENGTH = 600

# reference util/.../SourceId.java:6-23
SOURCE_ID_PATTERN = "^[a-zA-Z0-9:/-]{1,16}$"

GLOBAL_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("global_id", T.StringType(), False),
        T.StructField("local_id", T.StringType(), False),
        T.StructField("source_id", T.StringType(), False),
        T.StructField("source_version", T.IntegerType(), False),
        T.StructField("payload", T.StringType(), True),  # JSON string
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

MATCH_KEY_CONFIGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("matcher", T.StringType(), True),  # "module::function"
        T.StructField("method", T.StringType(), True),  # legacy: jsonpath|...
        T.StructField("update", T.StringType(), True),  # ingest | manual
        T.StructField("params", T.StringType(), True),  # JSON string
    ]
)

# edge table: (record, pool) -> one row per extracted match value
RECORD_MATCH_VALUES_SCHEMA = T.StructType(
    [
        T.StructField("global_id", T.StringType(), False),
        T.StructField("match_key_config_id", T.StringType(), False),
        T.StructField("match_value", T.StringType(), False),
    ]
)

# connected-components output (≙ reference cluster_records)
CLUSTER_ASSIGNMENTS_SCHEMA = T.StructType(
    [
        T.StructField("global_id", T.StringType(), False),
        T.StructField("match_key_config_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

# one row per cluster (≙ reference cluster_meta); datestamp drives
# OAI-style incremental export
CLUSTER_META_SCHEMA = T.StructType(
    [
        T.StructField("cluster_id", T.StringType(), False),
        T.StructField("match_key_config_id", T.StringType(), False),
        T.StructField("datestamp", T.TimestampType(), False),
    ]
)

MODULES_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # jsonpath | python
        T.StructField("url", T.StringType(), True),
        T.StructField("function", T.StringType(), True),
        T.StructField("script", T.StringType(), True),
    ]
)

TABLE_SCHEMAS = {
    "global_records": GLOBAL_RECORDS_SCHEMA,
    "match_key_configs": MATCH_KEY_CONFIGS_SCHEMA,
    "record_match_values": RECORD_MATCH_VALUES_SCHEMA,
    "cluster_assignments": CLUSTER_ASSIGNMENTS_SCHEMA,
    "cluster_meta": CLUSTER_META_SCHEMA,
    "modules": MODULES_SCHEMA,
}
