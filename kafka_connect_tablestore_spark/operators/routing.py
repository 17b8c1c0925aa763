"""Topic→table routing (SURVEY §2 S2).

Reference: ``TableStoreSinkConfig.java:715-737, 946-952`` (explicit
``topics.assign.tables`` map or ``table.name.format`` with ``<topic>``
substitution), used per record at ``TableStoreSinkWriter.java:222-224``.

Spark-first: routing is a single column expression (a literal map lookup with
format fallback), then one filtered write per distinct target — Catalyst
collapses the per-target filter into the scan.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import SinkConfig


def with_target_table(df: DataFrame, config: SinkConfig) -> DataFrame:
    """Add a ``target_table`` column — the column-expression twin of
    ``SinkConfig.table_for_topic`` (literal ``<topic>`` substitution, so a
    topic containing regex/group metacharacters like ``$1`` routes to the
    same table both driver-side and column-side)."""
    fmt = F.replace(
        F.lit(config.table_name_format), F.lit("<topic>"), F.col("topic")
    )
    if config.topic_table_map:
        m = F.create_map(
            *[F.lit(x) for x in chain.from_iterable(config.topic_table_map.items())]
        )
        expr = F.coalesce(F.element_at(m, F.col("topic")), fmt)
    else:
        expr = fmt
    return df.withColumn("target_table", expr)


class RoutedBatch(dict):
    """``target_table -> DataFrame`` with an :meth:`unpersist` releasing the
    shared cached routing frame once every per-table write has run."""

    def __init__(self, parts: dict, source: DataFrame | None) -> None:
        super().__init__(parts)
        self._source = source

    def unpersist(self) -> None:
        if self._source is not None:
            self._source.unpersist()
            self._source = None


def route(df: DataFrame, config: SinkConfig) -> RoutedBatch:
    """Split a multi-topic batch into per-target-table DataFrames.

    The batch is persisted for the routing fan-out: discovering the distinct
    target set is one real pass over the batch, and each per-table frame is
    a filter over the SAME materialization instead of a full upstream
    recompute per table (N targets would otherwise mean N+1 source scans).
    Call :meth:`RoutedBatch.unpersist` after the per-table writes.

    A null topic cannot be routed (the format would swallow it silently and
    the row would be written to a table named after an empty substitution) —
    refused up front."""
    routed = with_target_table(df, config).persist()
    targets = [r["target_table"] for r in routed.select("target_table").distinct().collect()]
    if any(t is None for t in targets):
        routed.unpersist()
        raise ValueError(
            "route: batch contains records with a NULL topic; they cannot "
            "be routed to a table (dead-letter or default them upstream)"
        )
    return RoutedBatch(
        {
            t: routed.where(F.col("target_table") == t).drop("target_table")
            for t in sorted(targets)
        },
        routed,
    )
