"""DLQ round-trip (S15/S16): errant events land in the DLQ with their
original payload intact, and can be re-parsed and replayed under a corrected
config — the reference's dead-letter-topic replay pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    InsertMode,
    RuntimeErrorTolerance,
    SinkConfig,
)
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.operators.errors import reparse_dlq
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def test_dlq_reparse_and_replay(spark, tmp_path):
    # update-mode + delete none: every tombstone is a dirty record
    strict = SinkConfig(
        insert_mode=InsertMode.UPDATE,
        delete_mode=DeleteMode.NONE,
        tolerance=RuntimeErrorTolerance.ALL,
    )
    events = synth_changelog(spark, 2000, seed=61, p_delete=0.2).cache()
    eng = CdcEngine(spark, strict, str(tmp_path / "a"))
    eng.apply_batch(events, "b0")
    dlq = eng.table.read_dlq()
    n_deletes = events.where("op = 'DELETE'").count()
    assert dlq is not None and dlq.count() == n_deletes

    # reconstruct the original events from the DLQ payload
    replayable = reparse_dlq(dlq)
    orig = events.where("op = 'DELETE'").select(*replayable.columns)
    got = {tuple(r) for r in replayable.collect()}
    want = {tuple(r) for r in orig.collect()}
    assert got == want  # payload survived the DLQ byte-for-byte

    # ops widen the config (allow row deletes) and replay the dead letters:
    # final state equals a single-pass run under the corrected config
    fixed = SinkConfig(insert_mode=InsertMode.UPDATE, delete_mode=DeleteMode.ROW)
    eng2 = CdcEngine(spark, fixed, str(tmp_path / "a"))  # same lake
    eng2.apply_batch(replayable, "b0-dlq-replay")

    ref = CdcEngine(spark, fixed, str(tmp_path / "ref"))
    ref.apply_batch(events, "b0")
    sig = lambda e: {  # noqa: E731
        (r["repo"], r["path"]): r["content_sha256"] for r in e.state().collect()
    }
    assert sig(eng2) == sig(ref)


def test_kafka_dlq_records_shape_and_header(spark):
    """KafkaReporter parity (errors/KafkaReporter.java:61-112): the frame has
    exactly the Spark Kafka-sink schema, the ErrorInfo header carries the
    error string, and key/value round-trip the original record."""
    import json

    from pyspark.sql import functions as F

    from kafka_connect_tablestore_spark.config import SinkConfig
    from kafka_connect_tablestore_spark.operators.errors import kafka_dlq_records
    from kafka_connect_tablestore_spark.operators.rowchange import (
        split_errant,
        validate_and_classify,
    )

    events = spark.createDataFrame(
        [
            ("t", 0, 1, 1000, "PUT", "r1", "a", "c1", "py", "x"),
            ("t", 0, 2, -5, "BOGUS_OP", "r1", None, "c2", "py", "y"),
        ],
        "topic string, partition int, offset long, commit_ts long, op string, "
        "repo string, path string, commit string, lang string, content string",
    )
    cfg = SinkConfig()
    classified = validate_and_classify(events, cfg, ("commit", "lang", "content"))
    _, errant = split_errant(classified)
    out = kafka_dlq_records(errant, cfg.pk_fields, topic="dlq-topic")

    assert [f.simpleString() for f in out.schema.fields] == [
        "topic:string",
        "key:binary",
        "value:binary",
        "headers:array<struct<key:string,value:binary>>",
        "timestamp:timestamp",
    ]
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["topic"] == "dlq-topic"
    assert json.loads(bytes(r["key"]).decode()) == {"repo": "r1"}  # null path absent
    payload = json.loads(bytes(r["value"]).decode())
    assert payload["op"] == "BOGUS_OP" and payload["content"] == "y"
    (hdr,) = r["headers"]
    assert hdr["key"] == "ErrorInfo" and len(bytes(hdr["value"])) > 0
    assert r["timestamp"] is None  # non-positive record timestamp -> null (:94-96)


def test_write_dlq_to_kafka_validates_and_probes_connector(spark):
    """The producer call itself: a malformed frame is rejected driver-side;
    with a well-formed frame it either reaches the Kafka sink (connector on
    classpath) or raises the documented connector-absent error — never a raw
    ClassNotFound from inside a job."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from kafka_connect_tablestore_spark.operators.errors import (
        kafka_connector_available,
        write_dlq_to_kafka,
    )

    bad = spark.range(1).select(F.lit("t").alias("topic"))  # no key/value
    with _pytest.raises(ValueError, match="kafka_dlq_records"):
        write_dlq_to_kafka(bad, "broker:9092")

    good = spark.range(1).select(
        F.lit("t").alias("topic"),
        F.lit("k").cast("binary").alias("key"),
        F.lit("v").cast("binary").alias("value"),
    )
    if kafka_connector_available(spark):
        _pytest.skip("connector present; broker write not exercised in tests")
    with _pytest.raises(RuntimeError, match="spark-sql-kafka"):
        write_dlq_to_kafka(good, "broker:9092")


def test_write_dlq_through_injected_sink_roundtrips(spark, tmp_path):
    """Round-4 directive 8: the injected-sink seam drives the EXACT Kafka
    producer frame through a parquet sink and round-trips it — original
    key/value bytes, ErrorInfo header, and replayability via reparse_dlq —
    so everything but the wire protocol is executable in-sandbox."""
    import json

    from pyspark.sql import functions as F

    from kafka_connect_tablestore_spark.config import SinkConfig
    from kafka_connect_tablestore_spark.operators.errors import (
        kafka_dlq_records,
        write_dlq_to_kafka,
    )
    from kafka_connect_tablestore_spark.operators.rowchange import (
        split_errant,
        validate_and_classify,
    )

    events = spark.createDataFrame(
        [
            ("t", 0, 1, 1000, "PUT", "r1", "a", "c1", "py", "x"),
            ("t", 0, 2, 2000, "PUT", "r1", None, "c2", "py", "y"),
            ("t", 1, 3, 3000, "PUT", None, "c", "c3", "go", "z"),
        ],
        "topic string, partition int, offset long, commit_ts long, op string, "
        "repo string, path string, commit string, lang string, content string",
    )
    cfg = SinkConfig()
    _, errant = split_errant(
        validate_and_classify(events, cfg, ("commit", "lang", "content"))
    )
    frame = kafka_dlq_records(errant, cfg.pk_fields, topic="dlq-topic")

    out = str(tmp_path / "dlq_sink")
    write_dlq_to_kafka(
        frame, "unused:9092", sink=lambda df: df.write.parquet(out)
    )

    back = spark.read.parquet(out)
    # byte-identical frame round-trip (headers incl.)
    key = lambda df: sorted(
        (
            r["topic"],
            bytes(r["key"]),
            bytes(r["value"]),
            tuple((h["key"], bytes(h["value"])) for h in r["headers"]),
        )
        for r in df.collect()
    )
    assert key(back) == key(frame) and back.count() == 2

    # and the sink payload is REPLAYABLE: value JSON reconstructs the events
    replayed = {
        json.loads(bytes(r["value"]).decode())["content"] for r in back.collect()
    }
    assert replayed == {"y", "z"}

    # malformed frames are rejected BEFORE reaching any sink
    import pytest as _pytest

    called = []
    bad = spark.range(1).select(F.lit("t").alias("topic"))
    with _pytest.raises(ValueError, match="kafka_dlq_records"):
        write_dlq_to_kafka(bad, "unused:9092", sink=lambda df: called.append(1))
    assert not called
