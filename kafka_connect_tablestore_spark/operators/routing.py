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
    """Add a ``target_table`` column."""
    fmt = F.regexp_replace(
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


def route(df: DataFrame, config: SinkConfig) -> dict[str, DataFrame]:
    """Split a multi-topic batch into per-target-table DataFrames.

    The distinct-target list is tiny (config-bounded), so collecting it is a
    metadata operation, not a data collect."""
    routed = with_target_table(df, config)
    targets = [r["target_table"] for r in routed.select("target_table").distinct().collect()]
    return {
        t: routed.where(F.col("target_table") == t).drop("target_table")
        for t in sorted(targets)
    }
