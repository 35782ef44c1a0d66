"""Incremental ingest: upsert batch → re-extract keys → re-cluster →
bump datestamps of changed clusters.

Replaces the reference's per-record transactional union-find
(reference server/.../Storage.java:251-522) with a deterministic batch
pipeline (SURVEY.md §2.7 "Spark primitive"): connected components are
recomputed per affected pool each batch, and datestamps advance for
exactly the clusters whose membership changed — reproducing the
observable invariant (datestamp bumps on insert/update/delete/merge)
without per-row locking.

Scale note: `ingest_batch` restricts the per-batch recompute to the
components the batch can actually change (`affected_subgraph`): CC
iterations — the multi-pass, shuffle-heavy part — run only over the
affected subgraph, so a 10k-record batch against a 36M-record pool
re-clusters thousands of rows, not millions. The remaining full-table
work is a constant number of single-pass joins (no iteration), which
at cluster scale co-locate if `cluster_assignments` and
`record_match_values` are bucketed by `global_id`.
`initialize_pool` remains the full rebuild (new/changed configs).
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


def affected_subgraph(
    values: DataFrame,
    old_assign: DataFrame,
    batch_ids: DataFrame,
    all_record_ids: DataFrame,
    pool_ids: list[str],
) -> DataFrame:
    """Per-pool record set whose cluster assignment can change this
    batch: (global_id, match_key_config_id), distinct.

    Closure argument: non-batch records' edges are unchanged, so in
    the new graph a batch record's component is a union of OLD
    components bridged by the batch's values, and a component can only
    split if it loses a batch record. Seeds are therefore the batch
    records plus every record sharing a current match value with one;
    expanding each seed to its ENTIRE old cluster closes the set — if
    a member of an included cluster shared a value with an outside
    record, both edges predate the batch and the two would already be
    one old cluster. Affected =

    - the batch records themselves (new records included), per pool;
    - every member of an old cluster containing a seed (covers merges
      the batch's values introduce — wholly, so a bridged cluster's
      far members relabel too — and updates/deletes splitting a
      remainder);
    - records with no assignment in the pool yet (fresh pool /
      pre-config records — degrades to a full rebuild exactly when
      one is needed).
    """
    pools = F.explode(
        F.array(*[F.lit(p) for p in pool_ids])
    ).alias("match_key_config_id")
    batch_pools = batch_ids.select("global_id", pools)

    old_pool_assign = old_assign.filter(
        F.col("match_key_config_id").isin(pool_ids)
    )
    batch_values = values.join(batch_ids, "global_id", "left_semi").select(
        "match_key_config_id", "match_value"
    ).distinct()
    value_sharers = values.join(
        batch_values, ["match_key_config_id", "match_value"], "left_semi"
    ).select("global_id", "match_key_config_id")
    seeds = batch_pools.unionByName(value_sharers)

    seed_clusters = old_pool_assign.join(
        seeds, ["global_id", "match_key_config_id"], "left_semi"
    ).select("match_key_config_id", "cluster_id").distinct()
    cluster_members = old_pool_assign.join(
        seed_clusters, ["match_key_config_id", "cluster_id"], "left_semi"
    ).select("global_id", "match_key_config_id")

    unassigned = all_record_ids.select("global_id", pools).join(
        old_pool_assign,
        ["global_id", "match_key_config_id"],
        "left_anti",
    )

    return (
        seeds.unionByName(cluster_members)
        .unionByName(unassigned)
        .distinct()
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

    # persist the batch: its lineage may be expensive (binaryFile scan
    # + MARC decode for uploads, streaming file source for
    # foreachBatch), and the counts/joins below would otherwise re-run
    # it once per action (~a dozen times)
    incoming = normalize_source_ids(incoming).persist()
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

    wh.write("global_records", merged, partition_by=["source_id"])
    # read back the committed snapshot: downstream plans scan the new
    # parquet version instead of recomputing the upsert joins, and the
    # versioned store keeps `existing`'s snapshot readable, so the
    # pre-write plans below stay valid (no eager materialization)
    merged = wh.read("global_records")

    # the batch's global ids: upserted rows (post-merge, so new records
    # have their ids) plus every version the tombstones removed
    batch_keys = incoming.select("local_id", "source_id").distinct()
    batch_ids = (
        merged.join(batch_keys, ["local_id", "source_id"], "left_semi")
        .select("global_id")
        .unionByName(
            existing.join(
                tombstones.select("local_id", "source_id").distinct(),
                ["local_id", "source_id"],
                "left_semi",
            ).select("global_id")
        )
        .distinct()
    )

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
        recluster_pools(wh, merged, ingest_configs, now_col, batch_ids=batch_ids)
    incoming.unpersist()
    return stats_out


def recluster_pools(
    wh: Warehouse,
    records: DataFrame,
    configs: list[dict],
    now=None,
    batch_ids: DataFrame | None = None,
) -> None:
    """Recompute match values + CC for the given pools and merge the
    results into the cluster tables, bumping changed clusters' meta.

    With ``batch_ids`` (a `global_id` frame), only the affected
    subgraph is re-clustered — match values are re-extracted for the
    batch records alone and CC runs over the components the batch can
    reach; everything else keeps its assignment (provably identical to
    a full recompute: min-label depends only on a component's member
    set, and unaffected components keep theirs). Without it, the full
    rebuild runs (`initialize_pool`)."""
    now = now if now is not None else F.current_timestamp()
    pool_ids = [c["id"] for c in configs]
    all_ids = records.select("global_id").distinct()
    old_values = wh.read("record_match_values")
    old_assign = wh.read("cluster_assignments")
    old_pool_assign = old_assign.filter(
        F.col("match_key_config_id").isin(pool_ids)
    )

    # reused frames are persist()ed (recompute-on-loss, fault-tolerant
    # on a real cluster) rather than localCheckpoint()ed; the versioned
    # Warehouse keeps pre-write snapshots readable, so nothing needs
    # eager materialization to survive the commits below
    cached = []

    def _cache(df: DataFrame) -> DataFrame:
        cached.append(df.persist())
        return df

    if batch_ids is None:
        values = _cache(
            truncate_match_values(extract_match_values(records, configs))
        )
        clustered = cluster_all_pools(values, pool_ids)
        # the reference assigns EVERY record a cluster per pool, including
        # records whose matcher produced no values (singleton cluster, empty
        # matchValues — Storage.java:441-484); CC only covers records with
        # edges, so add the valueless records as self-clusters
        pools = F.explode(
            F.array(*[F.lit(p) for p in pool_ids])
        ).alias("match_key_config_id")
        singletons = (
            all_ids.select("global_id", pools)
            .join(
                values.select("global_id", "match_key_config_id").distinct(),
                ["global_id", "match_key_config_id"],
                "left_anti",
            )
            .withColumn("cluster_id", F.col("global_id"))
        )
        assignments = _cache(clustered.unionByName(singletons))
        changed = changed_clusters(old_pool_assign, assignments)
    else:
        # incremental: re-extract values for the batch only
        new_vals = truncate_match_values(
            extract_match_values(
                records.join(batch_ids, "global_id", "left_semi"), configs
            )
        )
        kept_vals = old_values.filter(
            F.col("match_key_config_id").isin(pool_ids)
        ).join(batch_ids, "global_id", "left_anti")
        values = _cache(
            kept_vals.unionByName(new_vals.select(*kept_vals.columns))
        )

        affected = _cache(
            affected_subgraph(values, old_assign, batch_ids, all_ids, pool_ids)
        )
        aff_values = values.join(
            affected, ["global_id", "match_key_config_id"], "left_semi"
        )
        clustered_aff = cluster_all_pools(aff_values, pool_ids)
        # affected-but-valueless records that still exist → self-clusters
        # (the semi join excludes deleted batch ids, which must vanish)
        singletons = (
            affected.join(all_ids, "global_id", "left_semi")
            .join(
                aff_values.select(
                    "global_id", "match_key_config_id"
                ).distinct(),
                ["global_id", "match_key_config_id"],
                "left_anti",
            )
            .withColumn("cluster_id", F.col("global_id"))
        )
        new_aff = _cache(
            clustered_aff.unionByName(
                singletons.select(*clustered_aff.columns)
            )
        )
        changed = changed_clusters(
            old_pool_assign.join(
                affected, ["global_id", "match_key_config_id"], "left_semi"
            ),
            new_aff,
        )
        assignments = _cache(
            old_pool_assign.join(
                affected, ["global_id", "match_key_config_id"], "left_anti"
            ).unionByName(new_aff)
        )

    keep_values = old_values.filter(~F.col("match_key_config_id").isin(pool_ids))
    wh.write(
        "record_match_values",
        keep_values.unionByName(values.select(*keep_values.columns)),
    )

    keep_assign = old_assign.filter(~F.col("match_key_config_id").isin(pool_ids))
    wh.write(
        "cluster_assignments", keep_assign.unionByName(assignments)
    )

    old_meta = wh.read("cluster_meta")
    old_pool_meta = old_meta.filter(F.col("match_key_config_id").isin(pool_ids))
    new_meta = advance_meta(old_pool_meta, assignments, changed, now)
    keep_meta = old_meta.filter(~F.col("match_key_config_id").isin(pool_ids))
    wh.write("cluster_meta", keep_meta.unionByName(new_meta))

    for df in cached:
        df.unpersist()


def initialize_pool(wh: Warehouse, config: dict, now=None) -> None:
    """Full rebuild of one pool (reference
    `/config/matchkeys/{id}/initialize`, Storage.java:799-879) — used
    for manual-update pools and after config changes."""
    records = wh.read("global_records")
    recluster_pools(wh, records, [config], now)
