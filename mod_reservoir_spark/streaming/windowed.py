"""Watermarked streaming analytics over event streams.

Two operators the batch engine already exposes (`hourly_rollup`,
`sessionize` contract queries) re-expressed for unbounded input:

- `streaming_hourly_rollup`: readStream → withWatermark → windowed
  aggregate. Late events within the watermark update their window;
  events older than the watermark are dropped (bounded state — the
  property that matters at 100 TB/day).
- `streaming_sessionize`: gap-based sessions via
  ``applyInPandasWithState`` — the custom-stateful-operator escape
  hatch for semantics windowed aggregates can't express. State per
  user is (start, last, count); an event-time timeout at
  last + gap emits the closed session once the watermark passes it.

Both share the JSONL event schema used by the batch `events` table.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession, functions as F, types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def streaming_hourly_rollup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    query_name: str = "hourly_rollup_stream",
):
    """Per-(hour, event_type) counts and cents over a file stream,
    update-mode memory sink for inspection. Watermark bounds both
    state size and lateness acceptance."""
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n",
            "value_cents",
        )
    )
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


SESSION_OUTPUT = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
SESSION_STATE = "start_us long, last_us long, n_events long"


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pdf["ts"])
        if not ts_us:
            return
        ts_us.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0], 0
        closed = []
        for t in ts_us:
            if t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, n = t, 0
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        # event-time timeout: fire when the watermark passes last+gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _e, _n in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _s, e, _n in closed
                    ],
                    "n_events": [n_ for _s, _e, n_ in closed],
                }
            )

    return fn


def streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    query_name: str = "dedup_stream",
):
    """Streaming exact-dedup: emit each key once, with BOUNDED state.

    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes its event time, so state size is
    O(keys per watermark window), not O(all keys ever) — the property
    that lets an at-least-once ingest firehose (OAI harvest retries,
    upload replays, duplicate training documents) run deduped forever.
    This is the streaming face of the batch exact-dedup operator
    (pipeline/dedup.exact_duplicates); near-dup (MinHash) streaming
    would put the signature in key_cols via a preceding select.
    """
    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_sessionize(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
    query_name: str = "sessionize_stream",
):
    """Gap-based sessionization with per-user state and event-time
    timeouts (``applyInPandasWithState``). A session closes when its
    user is silent for `gap_seconds` of EVENT time — emitted either by
    a later in-batch event past the gap or by the timeout once the
    watermark passes session_end + gap."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )
    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            SESSION_OUTPUT,
            SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def streaming_near_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    warehouse,
    sig_table: str = "dedup_signatures",
    pairs_table: str = "neardup_pairs",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 2,
    threshold_ppm: int = 500000,
):
    """Streaming MinHash near-dup detection with MAINTAINED state —
    the production lifecycle of `minhash_lsh_pairs_incremental` wired
    into Structured Streaming via ``foreachBatch``.

    Per micro-batch of documents: (1) run the incremental LSH pass
    against the Warehouse-persisted corpus signature table — the
    corpus is never re-shingled, cost is O(batch × bucket occupancy);
    (2) append the verified pairs; (3) append the batch's signatures,
    becoming the corpus the NEXT batch joins against. Because every
    near-dup pair "touches" the batch of its later-arriving member,
    the union of all per-batch pair outputs equals the full batch
    `minhash_lsh_pairs` over everything ingested (equivalence pinned
    in tests/test_windowed_streaming.py).

    Replay safety: ``foreachBatch`` is at-least-once, so both appends
    are idempotent — signatures dedupe on doc_id, pairs on
    (doc_a, doc_b); a re-run batch rewrites the same rows. The
    Warehouse's versioned-pointer write means readers of version N are
    never disturbed by the version-N+1 write the same batch performs.
    """
    from mod_reservoir_spark.pipeline.dedup import (
        minhash_lsh_pairs_incremental,
        signature_table,
    )

    empty_sigs = spark.createDataFrame(
        [], "doc_id long, hsh array<bigint>, sig array<bigint>"
    )

    def process(batch_df, batch_id):
        batch_df = batch_df.filter(
            F.col("doc_id").isNotNull()
        ).localCheckpoint(eager=True)
        corpus_sigs = (
            warehouse.read(sig_table)
            if warehouse.exists(sig_table)
            else empty_sigs
        )
        pairs = minhash_lsh_pairs_incremental(
            batch_df,
            corpus_sigs=corpus_sigs,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            threshold_ppm=threshold_ppm,
        )
        prev_pairs = (
            warehouse.read(pairs_table)
            if warehouse.exists(pairs_table)
            else None
        )
        all_pairs = (
            prev_pairs.unionByName(pairs) if prev_pairs is not None else pairs
        ).dropDuplicates(["doc_a", "doc_b"])
        warehouse.write(pairs_table, all_pairs)
        new_sigs = signature_table(
            batch_df, num_hashes=num_hashes, shingle_n=shingle_n
        )
        warehouse.write(
            sig_table,
            corpus_sigs.unionByName(new_sigs).dropDuplicates(["doc_id"]),
        )
        # the incremental operator persists its signature frames; drop
        # them so a long-running stream doesn't accumulate cache
        spark.catalog.clearCache()

    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )
    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
