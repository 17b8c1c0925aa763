"""Change-log continuity monitoring: per-partition offset-gap detection.

A CDC pipeline's first operational question is "did we miss anything?" —
the reference connector relies on Kafka's own offset bookkeeping
(`TableStoreSinkTask` commits what it was handed), but a lake-native engine
replaying a log can CHECK continuity: within each (topic, partition) the
offsets must be dense, and any jump is either upstream compaction or data
loss.  The per-batch manifest (lake/table.py) records offset RANGES; this
operator verifies density INSIDE the ranges.

Shape at scale: one key-local window per (topic, partition) ordered by
offset — the same partitioning the log already has from Kafka, so at
10^10 events this is a partition-local sort with no cross-key traffic and
the output is gap-sized (ideally empty).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def offset_gaps(
    log: DataFrame,
    topic_col: str = "topic",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Rows marking every discontinuity in the per-partition offset
    sequence: ``(topic, partition, gap_start, gap_end, missing)`` where
    offsets in ``[gap_start, gap_end]`` (inclusive) are absent.

    The first offset of a partition is not a gap (the log may legitimately
    begin anywhere); duplicate offsets (redeliveries) are not gaps either —
    only forward jumps are reported.
    """
    w = Window.partitionBy(topic_col, partition_col).orderBy(offset_col)
    prev = F.lag(offset_col).over(w)
    return (
        log.select(topic_col, partition_col, offset_col)
        .withColumn("_prev", prev)
        .where(F.col("_prev").isNotNull() & (F.col(offset_col) > F.col("_prev") + 1))
        .select(
            F.col(topic_col),
            F.col(partition_col),
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col(offset_col) - 1).alias("gap_end"),
            (F.col(offset_col) - F.col("_prev") - 1).alias("missing"),
        )
    )


def arrival_stats(
    log: DataFrame,
    topic_col: str = "topic",
    partition_col: str = "partition",
    offset_col: str = "offset",
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Per-partition event-time disorder profile: how late do events arrive
    relative to the high-water mark already seen on their partition?

    For each event, lateness = ``max(ts) over earlier offsets − ts`` when
    positive (an event whose commit timestamp regressed behind the running
    maximum — the situation that forces the LWW fold to order by
    ``(commit_ts, offset)`` rather than arrival order, reference
    `RowChangeSorter` semantics).  Emits one row per (topic, partition):
    event count, late count, max and mean lateness in the timestamp's unit
    (ms for the synthetic log).  This is the measurement that sizes a
    streaming watermark: ``withWatermark(delay)`` must cover the observed
    lateness tail or the stateful operators drop those events.

    Shape at scale: identical to :func:`offset_gaps` — ONE partition-local
    window ordered by offset (the partitioning the log already has from
    Kafka, so no cross-key traffic), then a groupBy on the same key with
    map-side partial aggregation.  Output is |partitions| rows.
    """
    w = (
        Window.partitionBy(topic_col, partition_col)
        .orderBy(offset_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    running = F.max(ts_col).over(w)
    lag = running - F.col(ts_col)
    late = running.isNotNull() & (lag > 0)
    return (
        log.select(topic_col, partition_col, offset_col, ts_col)
        .withColumn("_lag", F.when(late, lag))
        .groupBy(topic_col, partition_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("_lag").cast("long").alias("n_late"),
            F.coalesce(F.max("_lag"), F.lit(0)).cast("long").alias("max_lag"),
            F.round(F.coalesce(F.avg("_lag"), F.lit(0.0)), 4).alias("avg_lag"),
        )
    )


def dedup_redelivered(
    log: DataFrame,
    topic_col: str = "topic",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Collapse at-least-once redeliveries to exactly-once input: keep one
    row per ``(topic, partition, offset)`` — the same record identity the
    batch manifest (lake/table.py) commits as offset ranges, applied here
    INSIDE a batch rather than across batches.  A Kafka consumer rebalance
    or producer retry re-emits byte-identical records under the same
    coordinates (reference parity: the connector trusts this identity when
    it commits offsets back — ``TableStoreSinkTask.java:106-122`` writes
    whatever ``put()`` was handed and leaves offset bookkeeping to the
    framework, at-least-once), so an arbitrary survivor is exact.

    Shape at scale: one hash-aggregate on the record identity — the same
    shuffle key as the log's native partitioning, and AQE coalesces the
    mostly-empty duplicate side.  Used before the LWW fold it makes full
    replay idempotent under duplicated delivery, which is the exactly-once
    sink guarantee expressed as a batch invariant.
    """
    return log.dropDuplicates([topic_col, partition_col, offset_col])


def churn_stats(
    log: DataFrame,
    key_col: str = "repo",
    op_col: str = "op",
    path_col: str = "path",
    partition_col: str = "partition",
    ts_col: str = "commit_ts",
) -> DataFrame:
    """Per-key change-log churn rollup — the lineage/metrics table an
    operator reads to find hot entities before they hurt: event volume and
    PUT/UPDATE/DELETE mix, distinct sub-keys touched, distinct source
    partitions, and the key's active time span.  The reference surfaces
    per-task counters through the Kafka Connect metrics registry
    (``TableStoreSinkTask`` relies on framework counters); a lake-native
    replay engine can compute the same operational profile relationally,
    per key, from the log itself.

    Shape at scale: ONE key aggregate — counts and min/max pre-reduce
    map-side, and the two distinct counts are expanded by Spark into a
    two-phase (key, value)-distinct aggregate, so a hot repo's duplicate
    (path, partition) values collapse before the final shuffle.  Output is
    |keys| rows; no window, no join.
    """
    op = F.col(op_col)
    return log.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum((op == F.lit("PUT")).cast("long")).alias("n_puts"),
        F.sum((op == F.lit("UPDATE")).cast("long")).alias("n_updates"),
        F.sum((op == F.lit("DELETE")).cast("long")).alias("n_deletes"),
        F.countDistinct(path_col).cast("long").alias("n_paths"),
        F.countDistinct(partition_col).cast("long").alias("n_partitions"),
        F.min(ts_col).cast("long").alias("first_ts"),
        F.max(ts_col).cast("long").alias("last_ts"),
    )
