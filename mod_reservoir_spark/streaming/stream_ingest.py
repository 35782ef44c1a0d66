"""Structured Streaming ingest: files arriving in a directory →
micro-batched clustering via foreachBatch.

The reference's upload path is an HTTP byte stream with queue-based
backpressure (reference server/.../UploadService.java:98,
IngestWriteStream.java:52-134); the Spark-native equivalent is a file
stream source with `maxFilesPerTrigger` bounding each micro-batch and
`foreachBatch` handing the batch to the same deterministic
``ingest_batch`` used for bulk loads — one code path for batch and
streaming (exactly-once per batch via the checkpointed source offset +
idempotent snapshot rewrite).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, types as T

from mod_reservoir_spark.core.storage import Warehouse
from mod_reservoir_spark.streaming.ingest import ingest_batch

INGEST_SCHEMA = T.StructType(
    [
        T.StructField("local_id", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("source_version", T.IntegerType()),
        T.StructField("payload", T.StringType()),
        T.StructField("delete", T.BooleanType()),
    ]
)


def start_stream_ingest(
    spark: SparkSession,
    warehouse: Warehouse,
    input_dir: str,
    configs: list[dict],
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
    available_now: bool = False,
):
    """Start (and return) the streaming query. Input: JSONL files of
    ingest records (the bulk-envelope rows, one per line)."""
    stream = (
        spark.readStream.schema(INGEST_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )

    def process(batch_df, epoch_id: int) -> None:
        # foreachBatch frames re-read their source files on EVERY
        # action, and ingest_batch runs ~a dozen (counts + joins) —
        # persist once so each micro-batch scans its files once
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            ingest_batch(warehouse, batch_df, configs)
        finally:
            batch_df.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
