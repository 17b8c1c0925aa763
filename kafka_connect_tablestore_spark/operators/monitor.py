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
