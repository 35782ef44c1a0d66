"""Cluster assembly and the CQL query surface over clusters/records.

Re-expresses the reference's retrieval path (SURVEY.md §3.1,
reference server/.../Storage.java:626-679, ClusterBuilder.java:16-133)
as single Spark jobs:

- the reference runs `SELECT DISTINCT ON (cluster_id) ... LIMIT/OFFSET`
  then an N+1 per-row re-query of members; we do one
  join + groupBy(cluster_id).agg(collect_list(struct(...))) — the N+1
  nested loop becomes a single co-partitioned aggregation.
- "join elision" (Storage.java:659-668 only joins tables the WHERE
  references) falls out naturally: we only author the join when the
  predicate needs it, and Catalyst prunes unreferenced columns.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from mod_reservoir_spark.plans.cql import Query, parse_cql

# field → column bindings per endpoint (reference CqlFields.java:3-16,
# ReservoirService.java:104-175). Plain string = text comparison (the
# reference's PG text columns, incl. id-like fields — 'localId = 0001'
# is the string '0001'); ('col', 'numeric') = numeric literal.
RECORD_FIELDS = {
    "id": "global_id",
    "globalId": "global_id",
    "localId": "local_id",
    "sourceId": "source_id",
    "sourceVersion": ("source_version", "numeric"),
}
CLUSTER_FIELDS = {
    "clusterId": "cluster_id",
    "globalId": "global_id",
    "localId": "local_id",
    "sourceId": "source_id",
    "sourceVersion": ("source_version", "numeric"),
    "matchValue": "match_value",
}
CONFIG_FIELDS = {"id": "id", "method": "method", "matcher": "matcher"}
MODULE_FIELDS = {"id": "id", "function": "function"}

DEFAULT_LIMIT = 10  # reference openapi/parameters/limit.yaml


def paginate(
    df: DataFrame,
    order_cols: list,
    limit: int = DEFAULT_LIMIT,
    offset: int = 0,
) -> DataFrame:
    """Deterministic page: total order, then offset+limit.

    Order columns must end in a unique key for stable pages; callers
    append the primary key. offset() + limit() push into a single
    TakeOrderedAndProject when small — no full sort materialization.
    """
    out = df.orderBy(*order_cols)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


@dataclass
class PagedResult:
    items: DataFrame
    total: int | None  # populated only for count="exact"


def get_records(
    records: DataFrame,
    cql: str | None = None,
    limit: int = DEFAULT_LIMIT,
    offset: int = 0,
    count: str = "none",
) -> PagedResult:
    """`GET /reservoir/records` analog (ReservoirService.java:98-117)."""
    q = parse_cql(cql)
    filtered = records.filter(q.to_column(RECORD_FIELDS))
    order = q.order_by(RECORD_FIELDS) or []
    order = order + [F.col("global_id")]
    total = filtered.count() if count == "exact" else None
    return PagedResult(paginate(filtered, order, limit, offset), total)


def latest_version_per_source(
    members: DataFrame,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Within a cluster keep every record at its source's MAX version —
    reference ClusterBuilder.latest (ClusterBuilder.java:72-96): the
    max-version map is keyed by sourceId ALONE, so a stale localId of
    the same source is dropped even if it is that localId's newest row,
    and ALL records tied at the max version are kept (no row_number).
    An unordered max window needs no sort — cheaper than the round-1
    row_number variant and semantically exact."""
    w = Window.partitionBy(cluster_col, "source_id")
    return (
        members.withColumn("_maxv", F.max("source_version").over(w))
        .filter(F.col("source_version") == F.col("_maxv"))
        .drop("_maxv")
    )


def build_clusters(
    assignments: DataFrame,
    records: DataFrame,
    match_values: DataFrame,
    meta: DataFrame | None = None,
) -> DataFrame:
    """Assemble the cluster output shape (ClusterBuilder.java:117-133):

    (cluster_id, datestamp, match_values[], records[{globalId, localId,
    sourceId, sourceVersion, payload}]) with latest-version-per-source
    and deterministic member sort by (sourceId, sourceVersion, localId)
    (ClusterBuilder.java:98-103) via array_sort on the collected structs.
    """
    members = latest_version_per_source(
        assignments.join(records, "global_id")
    )
    rec_struct = F.struct(
        F.col("source_id").alias("sourceId"),
        F.col("source_version").alias("sourceVersion"),
        F.col("local_id").alias("localId"),
        F.col("global_id").alias("globalId"),
        F.col("payload").alias("payload"),
    )
    per_cluster = members.groupBy("match_key_config_id", "cluster_id").agg(
        F.array_sort(F.collect_list(rec_struct)).alias("records")
    )
    values = (
        match_values.join(
            assignments, ["global_id", "match_key_config_id"]
        )
        .groupBy("match_key_config_id", "cluster_id")
        .agg(F.array_sort(F.collect_set("match_value")).alias("matchValues"))
    )
    out = per_cluster.join(
        values, ["match_key_config_id", "cluster_id"], "left"
    )
    if meta is not None:
        out = out.join(
            meta.select("cluster_id", "match_key_config_id", "datestamp"),
            ["match_key_config_id", "cluster_id"],
            "left",
        )
    return out


def get_clusters(
    assignments: DataFrame,
    records: DataFrame,
    match_values: DataFrame,
    match_key_config_id: str,
    cql: str | None = None,
    meta: DataFrame | None = None,
    limit: int = DEFAULT_LIMIT,
    offset: int = 0,
    count: str = "none",
) -> PagedResult:
    """`GET /reservoir/clusters?matchkeyid=...&query=...` analog.

    Join elision: the record and value joins are only authored when the
    CQL references their fields (reference Storage.java:657-679).
    """
    q = parse_cql(cql)
    selected = _selected_cluster_ids(
        assignments, records, match_values, match_key_config_id, q
    )
    total = selected.count() if count == "exact" else None
    page = paginate(selected, [F.col("cluster_id")], limit, offset)
    built = build_clusters(
        assignments.join(page, "cluster_id").filter(
            F.col("match_key_config_id") == match_key_config_id
        ),
        records,
        match_values,
        meta,
    )
    return PagedResult(built.orderBy("cluster_id"), total)


def _selected_cluster_ids(
    assignments: DataFrame,
    records: DataFrame,
    match_values: DataFrame,
    match_key_config_id: str,
    q: Query,
) -> DataFrame:
    """CQL-filtered distinct cluster ids for a pool, with the record
    and value joins elided unless the query references their fields
    (reference Storage.java:657-679)."""
    pool = assignments.filter(
        F.col("match_key_config_id") == match_key_config_id
    )
    referenced = _referenced_fields(q)
    base = pool
    if referenced & {"local_id", "source_id", "source_version"}:
        base = base.join(records, "global_id")
    if "match_value" in referenced:
        base = base.join(
            match_values.filter(
                F.col("match_key_config_id") == match_key_config_id
            ).select("global_id", "match_key_config_id", "match_value"),
            ["global_id", "match_key_config_id"],
        )
    return (
        base.filter(q.to_column(CLUSTER_FIELDS))
        .select("cluster_id")
        .dropDuplicates(["cluster_id"])
    )


def cluster_row_to_dict(row) -> dict:
    """A build_clusters row → the reference's cluster JSON shape
    (payload parsed to an object, ClusterBuilder.java:117-133)."""
    out = {
        "clusterId": row["cluster_id"],
        "matchValues": list(row["matchValues"] or []),
        "records": [
            {
                "globalId": m["globalId"],
                "localId": m["localId"],
                "sourceId": m["sourceId"],
                "sourceVersion": m["sourceVersion"],
                "payload": json.loads(m["payload"]) if m["payload"] else {},
            }
            for m in row["records"]
        ],
    }
    if "datestamp" in row.__fields__ and row["datestamp"] is not None:
        out["datestamp"] = str(row["datestamp"])
    return out


def stream_clusters(
    assignments: DataFrame,
    records: DataFrame,
    match_values: DataFrame,
    match_key_config_id: str,
    cql: str | None = None,
    meta: DataFrame | None = None,
):
    """Streamed (unpaginated) cluster export with bounded driver
    memory — the engine analog of the reference's chunked-JSON HTTP
    sink (streamed ReadStream over the full result set). Spark-native
    shape: the assembled cluster frame is range-sorted by cluster_id
    and iterated with ``toLocalIterator``, so the driver holds ONE
    partition at a time regardless of result size; prefetch overlaps
    the next partition's compute with consumption.

    Yields cluster dicts in cluster_id order.
    """
    q = parse_cql(cql)
    selected = _selected_cluster_ids(
        assignments, records, match_values, match_key_config_id, q
    )
    built = build_clusters(
        assignments.join(selected, "cluster_id").filter(
            F.col("match_key_config_id") == match_key_config_id
        ),
        records,
        match_values,
        meta,
    ).orderBy("cluster_id")
    for row in built.toLocalIterator(prefetchPartitions=True):
        yield cluster_row_to_dict(row)


def stream_clusters_json(*args, **kwargs):
    """`stream_clusters`, rendered: one compact JSON string per
    cluster — ready to chunk straight onto an HTTP response."""
    for d in stream_clusters(*args, **kwargs):
        yield json.dumps(d, separators=(",", ":"), ensure_ascii=False)


def _referenced_fields(q: Query) -> set[str]:
    from mod_reservoir_spark.plans.cql import BoolOp, NotOp, Term

    out: set[str] = set()

    def walk(node):
        if isinstance(node, Term):
            out.add(CLUSTER_FIELDS.get(node.field, node.field))
        elif isinstance(node, BoolOp):
            for p in node.parts:
                walk(p)
        elif isinstance(node, NotOp):
            walk(node.part)

    walk(q.where)
    return out


def matchkey_stats(
    assignments: DataFrame,
    match_values: DataFrame,
    match_key_config_id: str,
    sample_size: int = 3,
) -> dict:
    """Reference matchkey stats (Storage.java:881-965): clustersTotal,
    recordsTotal, histogram of records-per-cluster and
    matchvalues-per-cluster with ≤3 sample cluster ids per size.

    The reference streams a sort-grouped single pass; here it is two
    hash aggregations (records/cluster, then clusters/size) — fully
    map-side-combinable, no sort needed.
    """
    pool = assignments.filter(
        F.col("match_key_config_id") == match_key_config_id
    )
    values = match_values.filter(
        F.col("match_key_config_id") == match_key_config_id
    )
    per_cluster = (
        pool.groupBy("cluster_id")
        .agg(F.countDistinct("global_id").alias("n_records"))
        .join(
            values.join(pool, ["global_id", "match_key_config_id"])
            .groupBy("cluster_id")
            .agg(F.countDistinct("match_value").alias("n_values")),
            "cluster_id",
            "left",
        )
        .fillna(0, ["n_values"])
        .persist()
    )
    rec_hist = (
        per_cluster.groupBy("n_records")
        .agg(
            F.count("*").alias("clusters"),
            F.slice(F.array_sort(F.collect_list("cluster_id")), 1, sample_size).alias(
                "sample_clusters"
            ),
        )
        .orderBy("n_records")
        .collect()
    )
    val_hist = (
        per_cluster.groupBy("n_values")
        .agg(F.count("*").alias("clusters"))
        .orderBy("n_values")
        .collect()
    )
    totals = per_cluster.agg(
        F.count("*").alias("clustersTotal"),
        F.sum("n_records").alias("recordsTotal"),
    ).collect()[0]
    per_cluster.unpersist()
    return {
        "clustersTotal": totals["clustersTotal"],
        "recordsTotal": int(totals["recordsTotal"] or 0),
        "recordsPerCluster": [
            {
                "records": r["n_records"],
                "clusters": r["clusters"],
                "sampleClusters": r["sample_clusters"],
            }
            for r in rec_hist
        ],
        "matchValuesPerCluster": [
            {"matchValues": r["n_values"], "clusters": r["clusters"]}
            for r in val_hist
        ],
    }


def touch_clusters(
    meta: DataFrame,
    assignments: DataFrame,
    records: DataFrame,
    cql: str,
    now=None,
) -> DataFrame:
    """Bump datestamps of clusters matching the CQL — reference
    `POST /clusters/touch` (Storage.java:403-420). The reference
    requires the predicate to constrain matchkeyId and sourceId
    (guard against accidental full-table touch); we enforce the same.
    """
    q = parse_cql(cql)
    fields = {
        "matchkeyId": "match_key_config_id",
        "clusterId": "cluster_id",
        "sourceId": "source_id",
        "sourceVersion": "source_version",
    }
    referenced = {t.field for t in _terms(q)}
    if "matchkeyId" not in referenced or "sourceId" not in referenced:
        raise ValueError(
            "touch requires both matchkeyId and sourceId constraints"
        )
    now = now if now is not None else F.current_timestamp()
    touched = (
        assignments.join(records, "global_id")
        .filter(q.to_column(fields))
        .select("cluster_id", "match_key_config_id")
        .distinct()
        .withColumn("_touched", F.lit(True))
    )
    return (
        meta.join(touched, ["cluster_id", "match_key_config_id"], "left")
        .withColumn(
            "datestamp",
            F.when(F.col("_touched"), now).otherwise(F.col("datestamp")),
        )
        .drop("_touched")
    )


def _terms(q: Query):
    from mod_reservoir_spark.plans.cql import BoolOp, NotOp, Term

    stack, out = [q.where], []
    while stack:
        n = stack.pop()
        if isinstance(n, Term):
            out.append(n)
        elif isinstance(n, BoolOp):
            stack.extend(n.parts)
        elif isinstance(n, NotOp):
            stack.append(n.part)
    return out
