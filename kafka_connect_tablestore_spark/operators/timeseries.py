"""Timeseries-mode transform (SURVEY §2 S18).

The reference's secondary mode (``tablestore.mode=timeseries``,
``enums/TablestoreMode.java:7-20``) maps each record to a TimeseriesRow:

- **measurement**: a config-named field, or the literal ``<topic>``
  (``service/TimeseriesTransformer.java:164-179``);
- **dataSource**: a config-named field (``:180-186``);
- **tags**: a comma-list of field names → Map[String, String] (``:188-195``);
- **time**: a config-named field scaled from SECONDS/MILLIS/MICROS/NANOS to
  microseconds (``:59-85``);
- **fields**: the remaining columns, types mapped dynamically
  (Number→DOUBLE, bytes→BINARY, Boolean→BOOLEAN, else STRING —
  ``utils/ColumnCoverterUtil.java:79-92``), optionally lower-cased names
  (``:141-147``, config ``TableStoreSinkConfig.java:221``).

Spark-first: one ``select`` of codegen'd expressions; the tall-skinny
(measurement, datasource, tags, time_us, field, value) layout is a further
``stack``/explode if the sink wants one row per field.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: time-unit → microseconds multiplier (TimeseriesTransformer.java:59-85)
_UNIT_TO_US = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1 / 1_000}


@dataclass
class TimeseriesConfig:
    measurement_field: str | None = None  # None => literal topic
    datasource_field: str = "datasource"
    tag_fields: tuple[str, ...] = ()
    time_field: str = "time"
    time_unit: str = "ms"
    field_cols: tuple[str, ...] = field(default_factory=tuple)
    lowercase_fields: bool = False
    topic_literal: str = "repos"


def timeseries_transform(df: DataFrame, cfg: TimeseriesConfig) -> DataFrame:
    """Map records to timeseries rows.

    ``_tags`` is emitted both as a proper map column and as a deterministic
    ``k=v,k=v`` string (``_tags_str``, tag order = config order) so results
    are comparable across engines."""
    if cfg.measurement_field:
        measurement = F.col(cfg.measurement_field).cast("string")
    else:
        measurement = F.lit(cfg.topic_literal)
    mult = _UNIT_TO_US[cfg.time_unit]
    if mult >= 1:
        time_us = (F.col(cfg.time_field).cast("long") * F.lit(int(mult))).cast("long")
    else:  # nanoseconds: integer division keeps exactness
        time_us = (F.col(cfg.time_field).cast("long") / F.lit(1000)).cast("long")

    tag_pairs = []
    for t in cfg.tag_fields:
        tag_pairs += [F.lit(t), F.col(t).cast("string")]
    tags = F.create_map(*tag_pairs) if tag_pairs else F.create_map()
    tags_str = F.concat_ws(
        ",", *[F.concat_ws("=", F.lit(t), F.col(t).cast("string")) for t in cfg.tag_fields]
    )

    out = [
        measurement.alias("_measurement"),
        F.col(cfg.datasource_field).cast("string").alias("_datasource"),
        tags.alias("_tags"),
        tags_str.alias("_tags_str"),
        time_us.alias("_time_us"),
    ]
    for c in cfg.field_cols:
        name = c.lower() if cfg.lowercase_fields else c
        out.append(F.col(c).alias(name))
    return df.select(*out)


def to_tall_skinny(ts_df: DataFrame, field_cols: tuple[str, ...]) -> DataFrame:
    """One row per (key, field): the wide→tall layout used by timeseries
    stores; values unified to string (dynamic typing per the reference)."""
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as string)" for c in field_cols)
    return ts_df.select(
        "_measurement",
        "_datasource",
        "_tags_str",
        "_time_us",
        F.expr(f"stack({len(field_cols)}, {stack_expr}) as (field, value)"),
    )
