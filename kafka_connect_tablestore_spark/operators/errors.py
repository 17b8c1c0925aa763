"""Dead-letter queue round-trip (SURVEY §2 S15/S16).

The reference serializes errant records (original key/value JSON + an
ErrorInfo header) to a Kafka topic (``errors/KafkaReporter.java:61-112``) or
a Tablestore table with PK ``(topic_partition, offset)`` and attrs
``key:binary, value:binary, error_info:string``
(``errors/TableStoreReporter.java:243-270``) — crucially, the ORIGINAL
payload is preserved so operators can fix and replay.

``dlq_rows`` (in operators.rowchange) writes that layout; this module closes
the loop: ``reparse_dlq`` reconstructs replayable change events from a DLQ
table, so a corrected config (e.g. delete.mode widened, whitelist fixed) can
re-apply them — the Spark analogue of replaying a dead-letter topic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DLQ_VALUE_SCHEMA = T.StructType(
    [
        T.StructField("commit_ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def reparse_dlq(dlq: DataFrame) -> DataFrame:
    """DLQ rows → replayable change events.

    ``topic_partition`` splits back into (topic, partition) — the reference
    builds it as ``"<topic>_<partition>"`` (``TableStoreReporter.java:246``);
    the JSON-serialized original payload is re-parsed with an explicit schema
    (codegen'd ``from_json``, no Python)."""
    v = F.from_json(F.col("value").cast("string"), DLQ_VALUE_SCHEMA)
    tp = F.col("topic_partition")
    return dlq.select(
        F.regexp_extract(tp, r"^(.*)_(\d+)$", 1).alias("topic"),
        F.regexp_extract(tp, r"^(.*)_(\d+)$", 2).cast("int").alias("partition"),
        F.col("offset"),
        v.getField("commit_ts").alias("commit_ts"),
        v.getField("op").alias("op"),
        v.getField("repo").alias("repo"),
        v.getField("path").alias("path"),
        v.getField("commit").alias("commit"),
        v.getField("lang").alias("lang"),
        v.getField("content").alias("content"),
    )


def kafka_dlq_records(
    errant: DataFrame,
    pk_fields: tuple[str, ...] = ("repo", "path"),
    topic: str = "error-queue",
) -> DataFrame:
    """Errant records → Kafka-producer-shaped DLQ rows
    (``errors/KafkaReporter.java:61-112``).

    Emits exactly the schema Spark's Kafka sink
    (``df.write.format("kafka")``) accepts — ``topic:string, key:binary,
    value:binary, headers:array<struct<key:string,value:binary>>,
    timestamp:timestamp`` — so on a cluster with a broker this frame IS the
    producer call.  Mirroring ``convertToProducerRecord``:

    - key / value: the original record's serialized key and payload
      (``:90-92``; JSON here, the graft's wire format),
    - the record timestamp rides along (``:94-96``,
      ``checkAndConvertTimestamp``: non-positive → null),
    - one ``ErrorInfo`` header carries the error string (``:109``).
    """
    from kafka_connect_tablestore_spark.operators.rowchange import ERROR_COL

    key_json = F.to_json(F.struct(*pk_fields))
    payload_cols = [
        c for c in errant.columns if c not in ("topic", "partition", "offset", ERROR_COL)
    ]
    ts = F.col("commit_ts")
    return errant.select(
        F.lit(topic).alias("topic"),
        key_json.cast("binary").alias("key"),
        F.to_json(F.struct(*payload_cols)).cast("binary").alias("value"),
        F.array(
            F.struct(
                F.lit("ErrorInfo").alias("key"),
                F.col(ERROR_COL).cast("binary").alias("value"),
            )
        ).alias("headers"),
        F.when(ts > 0, F.timestamp_millis(ts)).alias("timestamp"),
    )


def kafka_connector_available(spark) -> bool:
    """True iff the ``spark-sql-kafka`` connector is on the classpath (it is
    a separate artifact, not bundled with a plain PySpark install).

    Resolution must go through SPARK'S classloader, not the system one:
    jars pulled in with ``spark-submit --packages`` live in Spark's
    MutableURLClassLoader, which single-arg ``Class.forName`` via the py4j
    gateway cannot see — that probe would refuse on a correctly configured
    cluster."""
    try:
        spark._jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader().loadClass(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def write_dlq_to_kafka(
    records: DataFrame,
    bootstrap_servers: str,
    extra_options: dict[str, str] | None = None,
    sink: Callable[[DataFrame], None] | None = None,
) -> None:
    """The actual producer call for a Kafka-layout DLQ
    (``errors/KafkaReporter.java:61-112`` → Spark's Kafka batch sink).

    ``records`` must be ``kafka_dlq_records``-shaped (``topic``/``key``/
    ``value`` at minimum; ``headers``/``timestamp`` ride along — the sink
    honors all five).  The default sink is ``format("kafka")`` — it needs
    the ``spark-sql-kafka`` connector jar and a reachable broker, neither
    of which exists in this sandbox.

    ``sink`` injects the writer for the validated frame: tests drive the
    EXACT producer frame through a parquet/memory sink and round-trip it
    (``test_dlq_roundtrip.py``), and a deployment can substitute e.g. a
    transactional producer wrapper.  Frame validation runs either way, so
    the injected path exercises everything but the wire protocol —
    broker integration remains the one sandbox-blocked seam."""
    required = {"topic", "key", "value"}
    missing = required - set(records.columns)
    if missing:
        raise ValueError(
            f"DLQ frame is missing Kafka-sink columns {sorted(missing)}; "
            "build it with kafka_dlq_records()"
        )
    if sink is not None:
        sink(records)
        return
    if not kafka_connector_available(records.sparkSession):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath — add the "
            "spark-sql-kafka-0-10 package to write the DLQ to a broker"
        )
    w = (
        records.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("includeHeaders", "true")
    )
    for k, v in (extra_options or {}).items():
        w = w.option(k, v)
    w.save()
