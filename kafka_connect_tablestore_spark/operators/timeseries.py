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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: time-unit → microseconds multiplier (TimeseriesTransformer.java:59-85)
#: multiplier to microseconds for the units coarser-or-equal than µs;
#: "ns" is the one divide-down unit and takes the exact-integer path below
_UNIT_TO_US = {"s": 1_000_000, "ms": 1_000, "us": 1}
_VALID_UNITS = (*_UNIT_TO_US, "ns")


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
    if cfg.time_unit not in _VALID_UNITS:
        raise ValueError(
            f"time_unit must be one of {sorted(_VALID_UNITS)}, "
            f"got {cfg.time_unit!r}"
        )
    if cfg.measurement_field:
        measurement = F.col(cfg.measurement_field).cast("string")
    else:
        measurement = F.lit(cfg.topic_literal)
    src = df
    if cfg.time_unit == "ns":
        # exact INTEGER division (SQL `div`, Java-truncation parity with the
        # reference's long/1000): Spark's `/` on longs goes through double,
        # whose ~256 ns ulp at 1e18 silently shifts real epoch-ns stamps by
        # up to a microsecond.  The value is staged under a safe name so no
        # user column name needs escaping inside expr().
        src = df.withColumn("__ts_ns__", F.col(cfg.time_field).cast("long"))
        time_us = F.expr("`__ts_ns__` div 1000").cast("long")
    else:
        mult = _UNIT_TO_US[cfg.time_unit]
        time_us = (F.col(cfg.time_field).cast("long") * F.lit(mult)).cast("long")

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
    return src.select(*out)


def to_tall_skinny(ts_df: DataFrame, field_cols: tuple[str, ...]) -> DataFrame:
    """One row per (key, field): the wide→tall layout used by timeseries
    stores; values unified to string (dynamic typing per the reference)."""
    if not field_cols:
        raise ValueError("to_tall_skinny requires at least one field column")
    bad = [c for c in field_cols if "`" in c or "'" in c]
    if bad:
        # the names are interpolated into a stack() SQL expression; quoting
        # metacharacters would need escaping the template itself
        raise ValueError(f"to_tall_skinny: unsupported characters in {bad}")
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as string)" for c in field_cols)
    return ts_df.select(
        "_measurement",
        "_datasource",
        "_tags_str",
        "_time_us",
        F.expr(f"stack({len(field_cols)}, {stack_expr}) as (field, value)"),
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts
    whenever the time since the previous event exceeds ``gap_seconds``.
    Emits one row per (key, session) with start/end, event count, and the
    summed ``value`` column — the canonical event-stream rollup a CDC
    changelog feeds (the reference stores raw rows; session boundaries are
    the first question asked of them).

    Gap math runs on exact integer microseconds with no session-timezone
    dependence: a TIMESTAMP (tz-aware) column uses ``unix_micros`` (pure
    epoch arithmetic — casting it to NTZ would go through the session
    wall clock, where a DST jump fakes a 60-minute gap shift), and an NTZ
    column uses ``timestampdiff(MICROSECOND, epoch, ts)`` (DuckDB twin:
    ``epoch_us``; parquet event logs load as NTZ in Spark 4 — see
    sources/synth.py for the same idiom).  No float epoch either way, so
    the engines agree bit-for-bit at any precision.
    ``id_col`` breaks equal-timestamp ties so session numbering is
    deterministic.

    Shape: ONE key-local shuffle — a lag + running-sum window over
    (key, ts, id) assigns session sequence numbers, then the session
    rollup groups on (key, session_seq), which Catalyst satisfies without
    a second exchange (the grouping keys prefix the window partitioning).
    Per-key window volume is bounded by a single key's event count; keys
    at web scale are users/devices (bounded), not domains — the same
    boundedness argument as ``offset_gaps``'s partition-local window.
    """
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    k = F.col(key_col)
    if dict(df.dtypes).get(ts_col) == "timestamp":
        us = F.unix_micros(F.col(ts_col))
    else:
        us = F.expr(
            f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', "
            f"cast(`{ts_col}` as timestamp_ntz))"
        )
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_us = F.lag(us).over(w)
    is_new = (
        prev_us.isNull()
        | ((us - prev_us) > F.lit(int(gap_seconds) * 1_000_000))
    ).cast("int")
    run = Window.partitionBy(key_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    seq = F.sum(is_new).over(run)
    sessions = df.select(
        k, F.col(ts_col), F.col(id_col), F.col("value"), seq.alias("session_seq")
    )
    return sessions.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    ).select(
        key_col,
        F.col("session_seq").cast("long").alias("session_seq"),
        "session_start",
        "session_end",
        "n_events",
        "total_value",
    )
