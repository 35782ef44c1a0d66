"""Incremental ingest: upsert batch → re-extract keys → re-cluster →
bump datestamps of changed clusters.

Replaces the reference's per-record transactional union-find
(reference server/.../Storage.java:251-522) with a deterministic batch
pipeline (SURVEY.md §2.7 "Spark primitive"): connected components are
recomputed per affected pool each batch, and datestamps advance for
exactly the clusters whose membership changed — reproducing the
observable invariant (datestamp bumps on insert/update/delete/merge)
without per-row locking.

Scale note: full-pool CC per batch is fine at metadata scale (the
PALCI sizing note is 36M bibs / 110M match entries — one modest CC
job); for much larger pools restrict the recompute to components
reachable from the batch's match values (`affected_subgraph`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mod_reservoir_spark.core.storage import Warehouse, upsert_records
from mod_reservoir_spark.operators.clustering import (
    cluster_all_pools,
    truncate_match_values,
)
from mod_reservoir_spark.operators.matchkeys import extract_match_values


def changed_clusters(
    old_assignments: DataFrame, new_assignments: DataFrame
) -> DataFrame:
    """Clusters whose membership set changed between snapshots: any
    (record, pool) pair that appears on exactly one side, or moved
    cluster, marks both its old and new cluster as changed."""
    o = old_assignments.select(
        "global_id", "match_key_config_id", F.col("cluster_id").alias("_old")
    )
    n = new_assignments.select(
        "global_id", "match_key_config_id", F.col("cluster_id").alias("_new")
    )
    full = o.join(n, ["global_id", "match_key_config_id"], "full_outer")
    moved = full.filter(
        F.col("_old").isNull()
        | F.col("_new").isNull()
        | (F.col("_old") != F.col("_new"))
    )
    return (
        moved.select(
            "match_key_config_id", F.col("_old").alias("cluster_id")
        )
        .unionByName(
            moved.select(
                "match_key_config_id", F.col("_new").alias("cluster_id")
            )
        )
        .filter(F.col("cluster_id").isNotNull())
        .distinct()
    )


def advance_meta(
    old_meta: DataFrame, new_assignments: DataFrame, changed: DataFrame, now=None
) -> DataFrame:
    """New cluster_meta: one row per live cluster; datestamp = previous
    datestamp, bumped to `now` for changed clusters (and for clusters
    that disappeared the reference keeps meta rows so deleted clusters
    are still listed by OAI with status=deleted — we keep them too,
    marked by a null membership join at export time)."""
    now = now if now is not None else F.current_timestamp()
    live = new_assignments.select("cluster_id", "match_key_config_id").distinct()
    keep_old = old_meta.select("cluster_id", "match_key_config_id", "datestamp")
    merged = (
        live.join(keep_old, ["cluster_id", "match_key_config_id"], "left")
        .unionByName(
            # clusters that vanished this batch (all members gone/moved):
            # keep their meta row, datestamp will bump below
            keep_old.join(live, ["cluster_id", "match_key_config_id"], "left_anti")
        )
    )
    changed = changed.withColumn("_chg", F.lit(True))
    return (
        merged.join(changed, ["cluster_id", "match_key_config_id"], "left")
        .withColumn(
            "datestamp",
            F.when(
                F.col("_chg") | F.col("datestamp").isNull(), now
            ).otherwise(F.col("datestamp")),
        )
        .drop("_chg")
    )


def ingest_batch(
    wh: Warehouse,
    incoming: DataFrame,
    configs: list[dict],
    now=None,
) -> dict:
    """One micro-batch: upsert records, handle tombstones, re-extract
    match values for ingest-mode pools, re-cluster, advance meta.

    Returns ingest stats (reference IngestStats.java contract:
    processed/inserted/updated/deleted counters from snapshot diffs).
    """
    now_col = now if now is not None else F.current_timestamp()
    existing = wh.read("global_records")

    from mod_reservoir_spark.core.storage import normalize_source_ids

    incoming = normalize_source_ids(incoming)
    processed = incoming.count()
    tombstones = incoming.filter(F.col("delete") == True)  # noqa: E712
    upserts = incoming.filter(
        F.col("delete").isNull() | (F.col("delete") == False)  # noqa: E712
    ).drop("delete")

    merged, stats = upsert_records(existing, upserts, now_col)
    # tombstone: remove every version of (local_id, source_id)
    merged = merged.join(
        tombstones.select("local_id", "source_id").distinct(),
        ["local_id", "source_id"],
        "left_anti",
    )
    deleted = existing.join(
        tombstones.select("local_id", "source_id").distinct(),
        ["local_id", "source_id"],
        "left_semi",
    ).count()

    merged = merged.localCheckpoint(eager=True)
    wh.write("global_records", merged, partition_by=["source_id"])

    ingest_configs = [
        c for c in configs if (c.get("update") or "ingest") == "ingest"
    ]
    stats_out = {
        "processed": processed,
        "inserted": stats["inserted"],
        "updated": stats["updated"],
        "deleted": deleted,
    }
    if ingest_configs:
        recluster_pools(wh, merged, ingest_configs, now_col)
    return stats_out


def recluster_pools(
    wh: Warehouse, records: DataFrame, configs: list[dict], now=None
) -> None:
    """Recompute match values + CC for the given pools and merge the
    results into the cluster tables, bumping changed clusters' meta."""
    now = now if now is not None else F.current_timestamp()
    pool_ids = [c["id"] for c in configs]

    values = truncate_match_values(
        extract_match_values(records, configs)
    ).localCheckpoint(eager=True)
    clustered = cluster_all_pools(values, pool_ids)
    # the reference assigns EVERY record a cluster per pool, including
    # records whose matcher produced no values (singleton cluster, empty
    # matchValues — Storage.java:441-484); CC only covers records with
    # edges, so add the valueless records as self-clusters
    singletons = []
    all_ids = records.select("global_id").distinct()
    for pid in pool_ids:
        pool_ids_with_values = (
            values.filter(F.col("match_key_config_id") == pid)
            .select("global_id")
            .distinct()
        )
        singletons.append(
            all_ids.join(pool_ids_with_values, "global_id", "left_anti")
            .select(
                "global_id",
                F.lit(pid).alias("match_key_config_id"),
                F.col("global_id").alias("cluster_id"),
            )
        )
    for s in singletons:
        clustered = clustered.unionByName(s)
    assignments = clustered.localCheckpoint(eager=True)

    old_values = wh.read("record_match_values")
    keep_values = old_values.filter(~F.col("match_key_config_id").isin(pool_ids))
    wh.write(
        "record_match_values",
        keep_values.unionByName(values).localCheckpoint(eager=True),
    )

    old_assign = wh.read("cluster_assignments")
    old_pool_assign = old_assign.filter(
        F.col("match_key_config_id").isin(pool_ids)
    )
    # materialize before the assignments overwrite below invalidates the
    # old snapshot files this plan reads
    changed = changed_clusters(old_pool_assign, assignments).localCheckpoint(
        eager=True
    )

    keep_assign = old_assign.filter(~F.col("match_key_config_id").isin(pool_ids))
    wh.write(
        "cluster_assignments",
        keep_assign.unionByName(assignments).localCheckpoint(eager=True),
    )

    old_meta = wh.read("cluster_meta")
    old_pool_meta = old_meta.filter(F.col("match_key_config_id").isin(pool_ids))
    new_meta = advance_meta(old_pool_meta, assignments, changed, now)
    keep_meta = old_meta.filter(~F.col("match_key_config_id").isin(pool_ids))
    wh.write(
        "cluster_meta",
        keep_meta.unionByName(new_meta).localCheckpoint(eager=True),
    )


def initialize_pool(wh: Warehouse, config: dict, now=None) -> None:
    """Full rebuild of one pool (reference
    `/config/matchkeys/{id}/initialize`, Storage.java:799-879) — used
    for manual-update pools and after config changes."""
    records = wh.read("global_records")
    recluster_pools(wh, records, [config], now)
