"""Structured Streaming front-end (SURVEY §2 S1/S19/S21).

The reference is driven by the Kafka Connect runtime delivering
``put(Collection<SinkRecord>)`` batches (``TableStoreSinkTask.java:106-122``);
our equivalent is Structured Streaming delivering micro-batches into
``foreachBatch``, with the checkpoint directory owning source progress and
the LakeTable's batch manifest owning sink idempotency — together: end-to-end
exactly-once (at-least-once redelivery from the checkpoint × idempotent
batch_id commit = effectively-once).

In production the source line is ``spark.readStream.format("kafka")``; tests
use a file-stream source over the same change-log schema (no Kafka broker in
the sandbox), which exercises identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from kafka_connect_tablestore_spark.engine import CdcEngine


def start_cdc_stream(
    events_stream: DataFrame,
    engine: CdcEngine,
    checkpoint_dir: str,
    *,
    available_now: bool = True,
    processing_time: str | None = None,
    query_name: str = "cdc-ingest",
) -> StreamingQuery:
    """Wire a streaming change-log DataFrame into the CDC engine.

    ``foreachBatch`` batch_ids are stable across restarts for the same
    checkpoint, so a batch replayed after a crash hits the LakeTable's
    committed-manifest skip (exactly-once upgrade of S19).
    """

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        engine.apply_batch(batch_df, f"stream-{batch_id}")

    writer = (
        events_stream.writeStream.foreachBatch(_apply)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def kafka_source_plan(spark, bootstrap: str, topic: str) -> DataFrame:
    """The production source line (documented; no broker in the sandbox).

    Returns a streaming DataFrame with the engine's envelope columns from a
    Kafka topic carrying JSON change events.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    payload = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.unix_millis(F.col("timestamp")).alias("commit_ts"),
        F.from_json(F.col("value").cast("string"), payload).alias("v"),
    ).select("topic", "partition", "offset", "commit_ts", "v.*")
