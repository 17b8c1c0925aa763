"""Primary-key extraction modes (SURVEY §2 S3/S4/S5/S6).

Reference dispatch: ``utils/RowChangeTransformer.java:76-89``; per-mode logic:

- KAFKA  (``:112-125``): PK := (topic_partition = "<topic>_<partition>",
  offset) — names/types fixed at ``TableStoreSinkConfig.java:99-102``.
- RECORD_KEY / RECORD_VALUE (``:134-165``): config-listed fields pulled from
  the key (resp. value) payload; a null payload/field is an errant record.
- SEARCH (``:92-104``): PK := (md5("<topic>_<partition>_<offset>")[0:5],
  topic, partition, offset) + a ``timestamp`` column from the record
  timestamp (SearchTimeMode.KAFKA) or wall clock (LOCAL).
- AUTO_INCREMENT placeholder (``DefaultEventParser.java:86-94``):
  ``monotonically_increasing_id`` stands in for the server-side fill.

All pure Catalyst expressions — zero Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import PrimaryKeyMode, SearchTimeMode, SinkConfig


def pk_kafka(df: DataFrame) -> DataFrame:
    """PK (topic_partition:string, offset:long) — RowChangeTransformer.java:112-125."""
    return df.withColumn(
        "topic_partition", F.concat_ws("_", F.col("topic"), F.col("partition"))
    )


def pk_search(df: DataFrame, *, time_mode: SearchTimeMode = SearchTimeMode.KAFKA) -> DataFrame:
    """PK (md5:string[5], topic, partition, offset) + timestamp —
    RowChangeTransformer.java:92-104."""
    ident = F.concat_ws("_", F.col("topic"), F.col("partition"), F.col("offset"))
    out = df.withColumn("md5", F.substring(F.md5(ident), 1, 5))
    if time_mode is SearchTimeMode.KAFKA:
        ts = F.col("commit_ts")
    else:  # LOCAL: wall clock; deterministic stand-in pinned at plan time
        ts = F.unix_millis(F.current_timestamp())
    return out.withColumn("timestamp", ts.cast("long"))


def pk_record_fields(df: DataFrame, config: SinkConfig) -> DataFrame:
    """RECORD_KEY / RECORD_VALUE: PK fields come from the payload; cast to the
    configured PK type lattice (STRING/INTEGER→long/BINARY only,
    ``DefaultEventParser.java:389-428``).  ``try_cast`` semantics (via the
    shared :func:`cast_pk_columns`): an uncastable value becomes a NULL PK and
    is dead-lettered by the S14 gate — this module's own contract ("a null
    payload/field is an errant record") — instead of failing the job under
    ANSI mode."""
    from kafka_connect_tablestore_spark.functions.hashing import cast_pk_columns

    return cast_pk_columns(df, config.pk_fields, config.pk_types)


def with_auto_increment(df: DataFrame, col: str, batch_seq: int | None = None) -> DataFrame:
    """Fill a missing auto_increment PK column with a unique placeholder
    (``DefaultEventParser.java:86-94``).  Values are unique but not dense,
    matching the server-side-assigned semantics (no total order promised).

    ``monotonically_increasing_id`` restarts at 0 every job, so two batches
    would collide (and LWW-overwrite each other's rows).  Pass ``batch_seq``
    — a small per-batch sequence number, e.g. the micro-batch index — to
    namespace the ids: the placeholder becomes
    ``(batch_seq << 49) | (partition_id << 33) | row_in_partition``, unique
    across batches while ``batch_seq < 2^14``, ``partitions < 2^16`` and
    rows-per-partition < 2^33 (Spark's own mono-id row budget).  The
    single-frame form (``batch_seq=None``) keeps the raw id."""
    if batch_seq is None:
        fill = F.monotonically_increasing_id()
    else:
        if not (0 <= batch_seq < (1 << 14)):
            raise ValueError("with_auto_increment: batch_seq must be in [0, 2^14)")
        mono = F.monotonically_increasing_id()
        pid = F.shiftright(mono, 33)  # Spark layout: partition_id << 33 | row
        row = mono - F.shiftleft(pid, 33)
        fill = F.shiftleft(F.lit(batch_seq).cast("long"), 49) + F.shiftleft(pid, 33) + row
    return df.withColumn(
        col,
        F.coalesce(F.col(col) if col in df.columns else F.lit(None).cast("long"), fill),
    )


def extract_pk(df: DataFrame, config: SinkConfig) -> DataFrame:
    if config.pk_mode is PrimaryKeyMode.KAFKA:
        return pk_kafka(df)
    if config.pk_mode is PrimaryKeyMode.SEARCH:
        return pk_search(df, time_mode=config.search_time_mode)
    return pk_record_fields(df, config)
