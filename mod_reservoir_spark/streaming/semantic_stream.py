"""Streaming face for SemDeDup — semantic near-duplicate detection
under continuous ingest, completing the dedup-family lifecycle: exact
(fingerprints) and MinHash near-dedup have had maintained streaming
state since round 4-5; this gives the embedding family the same shape.

State contract (the ``streaming_near_dedup`` shape, windowed.py):

- centroids are FROZEN for the stream's lifetime (trained offline with
  :func:`~mod_reservoir_spark.pipeline.similarity.kmeans_train` on a
  sample — the frozen-reference argument from the LM gate and the
  benchmark signature table: a moving cell structure would re-assign
  old vectors and break the replay contract; refresh = retrain +
  restart on compacted state);
- per micro-batch of ``(vec_id, embedding)``: assign the batch to
  cells (:func:`ivf_assign` under the frozen centroids, two-level
  routing included), read the accumulated member state EXCLUDING the
  batch's own ids (broadcast anti-join — replay safety), emit
  within-batch pairs (self-join, each unordered pair once) plus
  batch × corpus cross pairs through the shared
  :func:`~mod_reservoir_spark.pipeline.similarity.cell_cosine_pairs`
  core, and commit the batch's ``(vec_id, cell, v)`` members and its
  pairs as immutable ``batch=<id>`` partitions (stage + rename);
- because every pair touches the batch of its later-arriving member,
  the union of per-batch pair partitions equals the one-shot
  within-cell pair set over everything ingested under the same frozen
  centroids (equivalence pinned in tests); the keeper is read-time:
  ``near_dedup_keep(ids, pairs=folded_pairs)`` — identical CC policy
  to batch :func:`semantic_dedup`.

At 100 TB: per-batch cost is the batch assignment plus a cell
equi-join against only the cells the batch touches; state grows one
bounded partition per batch; no stage re-reads the corpus vectors
outside the cell join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from mod_reservoir_spark.pipeline.similarity import (
    cell_cosine_pairs,
    ivf_assign,
)
from mod_reservoir_spark.streaming.windowed import _commit_sketch_partition

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def streaming_semantic_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    two_level: bool | str = "auto",
    schema=None,
):
    """Start the streaming SemDeDup over JSONL ``(vec_id, embedding)``
    rows in ``input_dir``. Returns the StreamingQuery; read the
    accumulated state with :func:`read_semantic_dedup_state`."""
    members_root = os.path.join(state_dir, "members")
    pairs_root = os.path.join(state_dir, "pairs")
    empty_members = spark.createDataFrame(
        [], "vec_id long, cell int, v array<double>"
    )

    def read_members(before_batch):
        if not os.path.isdir(members_root) or not any(
            e.startswith("batch=") for e in os.listdir(members_root)
        ):
            return empty_members
        # only partitions committed BEFORE this batch id: for a new
        # batch that is all of them; for an at-least-once REPLAY of an
        # older batch it excludes later arrivals, so the rewritten
        # pairs partition is row-identical to the original run
        # (ADVICE r7 — without the filter a replay gained orientation
        # duplicates of cross pairs owned by later partitions; the
        # folded SET was stable, row-level idempotence was not).
        # Compacted batch=-1 partitions predate any live id by
        # construction (compaction runs on a stopped stream).
        return (
            spark.read.parquet(members_root)
            .filter(F.col("batch") < before_batch)
            .select("vec_id", "cell", "v")
        )

    def process(batch_df, batch_id):
        batch_df = batch_df.filter(F.col("vec_id").isNotNull())
        cells = ivf_assign(
            batch_df, centroids=centroids, two_level=two_level
        )
        batch_ev = (
            batch_df.select(
                "vec_id",
                F.transform("embedding", lambda x: x.cast("double")).alias(
                    "v"
                ),
            )
            .join(cells, "vec_id")
            .persist()
        )
        corpus_ev = (
            read_members(batch_id)
            .join(
                F.broadcast(batch_ev.select("vec_id")),
                "vec_id",
                "left_anti",
            )
            .persist()
        )
        try:
            within = cell_cosine_pairs(batch_ev, batch_ev, threshold)
            cross = cell_cosine_pairs(
                batch_ev, corpus_ev, threshold, self_join=False
            )
            pairs = within.unionByName(cross)
            # pairs derive from both persisted frames; checkpoint ONE
            # row set before the state commit (the near_dedup pattern)
            pairs = pairs.localCheckpoint(eager=True)
            _commit_sketch_partition(pairs, pairs_root, batch_id)
            _commit_sketch_partition(
                batch_ev.select("vec_id", "cell", "v"),
                members_root,
                batch_id,
            )
        finally:
            batch_ev.unpersist()
            corpus_ev.unpersist()

    docs = (
        spark.readStream.schema(schema or EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )
    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_semantic_dedup_state(
    spark: SparkSession, state_dir: str
) -> dict:
    """Compact the streaming-SemDeDup state (members + pairs) into one
    ``batch=-1`` partition per table: keep-latest (cell, v) per
    vec_id, drop pairs staler than either member's current content —
    the :func:`~mod_reservoir_spark.streaming.windowed.
    compact_near_dedup_state` semantics for the embedding family. Run
    while the stream is stopped; idempotent."""
    from mod_reservoir_spark.streaming.windowed import (
        _compact_id_pairs_state,
    )

    return _compact_id_pairs_state(
        spark, state_dir, "members", "vec_id", ["cell", "v"], []
    )


def read_semantic_dedup_state(
    spark: SparkSession, state_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(members, pairs) folded over every committed batch partition.
    ``members`` is the accumulated (vec_id, cell, v) assignment table;
    ``pairs`` is the full near-duplicate pair graph — feed it to
    ``near_dedup_keep(ids, pairs=...)`` for the batch-identical CC
    keeper, or to ``semantic_dedup``'s keep policies."""
    def read_or_empty(root, schema, cols):
        if not os.path.isdir(root) or not any(
            e.startswith("batch=") for e in os.listdir(root)
        ):
            return spark.createDataFrame([], schema)
        return spark.read.parquet(root).select(*cols)

    members = read_or_empty(
        os.path.join(state_dir, "members"),
        "vec_id long, cell int, v array<double>",
        ["vec_id", "cell", "v"],
    )
    pairs = read_or_empty(
        os.path.join(state_dir, "pairs"),
        "doc_a long, doc_b long",
        ["doc_a", "doc_b"],
    )
    return members, pairs
