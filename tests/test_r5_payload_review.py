"""Payload front-end review hardening (round-5 final review of payloads.py /
keys.py / routing.py / casts.py): parser-error preservation through the
classifier, Connect-vocabulary casts, ANSI-safe PK casts, cross-batch
auto-increment namespacing, tombstone-preserving dynamic explode, whitelist
gating of synthetic string columns, and literal (metacharacter-safe) routing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    PrimaryKeyMode,
    SinkConfig,
)
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.functions.casts import cast_column_lattice
from kafka_connect_tablestore_spark.operators.keys import (
    pk_record_fields,
    with_auto_increment,
)
from kafka_connect_tablestore_spark.operators.payloads import (
    explode_map_payload,
    parse_key_value,
    parse_map_payload,
)
from kafka_connect_tablestore_spark.operators.routing import route, with_target_table
from kafka_connect_tablestore_spark.operators.rowchange import (
    ERROR_COL,
    split_errant,
    validate_and_classify,
)


def test_parser_type_mismatch_survives_classification_to_dlq(spark, tmp_path):
    """parse_map_payload's TYPE_MISMATCH must not be clobbered by
    validate_and_classify — the parsed-but-bad record ends in the DLQ, not
    merged with a silently nulled field."""
    rows = [
        ("t", 0, 0, 1, "PUT", "r", "p", {"stars": "5"}),
        ("t", 0, 1, 2, "PUT", "r", "q", {"stars": "five"}),  # uncastable
    ]
    ddl = (
        "topic string, partition int, offset long, commit_ts long, op string, "
        "repo string, path string, value_map map<string,string>"
    )
    cfg = SinkConfig(
        delete_mode=DeleteMode.ROW,
        event_parser=lambda df: parse_map_payload(df, None, {"stars": "int64"}),
    )
    eng = CdcEngine(spark, cfg, str(tmp_path), attr_fields=("stars",))
    m = eng.apply_batch(spark.createDataFrame(rows, ddl), "b-0")
    errant = sum(p.get("errant_rows", 0) for p in m["partitions"].values())
    assert errant == 1
    dlq = eng.table.read_dlq()
    assert [r["error_info"] for r in dlq.collect()] == ["TYPE_MISMATCH:stars"]
    got = {(r["repo"], r["path"]): r["stars"] for r in eng.state().collect()}
    assert got == {("r", "p"): 5}  # the bad record never reached the table


def test_cast_column_lattice_accepts_connect_vocabulary(spark):
    df = spark.createDataFrame([(1, 2.5, "x")], "a int, b float, c string")
    out = cast_column_lattice(df, declared={"a": "int64", "b": "float32"})
    assert dict(out.dtypes) == {"a": "bigint", "b": "double", "c": "string"}


def test_pk_record_fields_uncastable_value_nulls_not_crashes(spark):
    cfg = SinkConfig(pk_fields=("id", "path"), pk_types=("long", "string"))
    df = spark.createDataFrame([("abc", "p"), ("7", "q")], "id string, path string")
    out = pk_record_fields(df, cfg)
    got = {r["path"]: r["id"] for r in out.collect()}
    assert got == {"p": None, "q": 7}  # null PK -> S14 gate, never a job error


def test_auto_increment_namespaced_across_batches(spark):
    df = spark.range(1000).select(F.lit(None).cast("long").alias("auto"))
    a = {r["auto"] for r in with_auto_increment(df, "auto", batch_seq=1).collect()}
    b = {r["auto"] for r in with_auto_increment(df, "auto", batch_seq=2).collect()}
    assert len(a) == 1000 and len(b) == 1000
    assert not (a & b)  # the raw mono-id form would collide 100%
    with pytest.raises(ValueError, match="batch_seq"):
        with_auto_increment(df, "auto", batch_seq=1 << 14)


def test_explode_map_payload_keeps_null_and_empty_map_records(spark):
    ddl = "event_id long, value_map map<string,string>"
    df = spark.createDataFrame(
        [(1, {"a": "1"}), (2, None), (3, {})], ddl
    )
    out = explode_map_payload(df, ("event_id",))
    by_id = {r["event_id"]: r for r in out.collect()}
    assert set(by_id) == {1, 2, 3}  # tombstone/empty records stay visible
    assert by_id[2]["field"] is None and by_id[2]["dyn_type"] is None
    assert by_id[1]["dyn_type"] == "double" and by_id[1]["v_double"] == 1.0


def test_string_key_attribute_respects_whitelist(spark):
    ddl = (
        "topic string, partition int, offset long, commit_ts long, "
        "key string, value struct<repo:string, path:string, note:string>"
    )
    rows = [("t", 0, 0, 1, "k-raw", ("r", "p", "n"))]
    df = spark.createDataFrame(rows, ddl)
    cfg = SinkConfig(pk_mode=PrimaryKeyMode.RECORD_VALUE, column_whitelist=("note",))
    out = parse_key_value(df, cfg)
    assert "key" not in out.columns and "note" in out.columns
    cfg2 = SinkConfig(pk_mode=PrimaryKeyMode.RECORD_VALUE, column_whitelist=("note", "key"))
    assert "key" in parse_key_value(df, cfg2).columns


def test_routing_is_literal_and_agrees_with_config(spark):
    """A topic containing regex/group metacharacters must route identically
    column-side and driver-side."""
    cfg = SinkConfig(table_name_format="tbl_<topic>")
    df = spark.createDataFrame([("metrics$1",), ("a.b+c",)], "topic string")
    got = {r["topic"]: r["target_table"] for r in with_target_table(df, cfg).collect()}
    for topic, table in got.items():
        assert table == cfg.table_for_topic(topic)
    assert got["metrics$1"] == "tbl_metrics$1"


def test_route_refuses_null_topic(spark):
    cfg = SinkConfig()
    df = spark.createDataFrame([("a",), (None,)], "topic string")
    with pytest.raises(ValueError, match="NULL topic"):
        route(df, cfg)


def test_route_shares_one_materialization_and_unpersists(spark):
    cfg = SinkConfig(table_name_format="t_<topic>")
    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "topic string, v int")
    parts = route(df, cfg)
    assert set(parts) == {"t_a", "t_b"}
    assert parts._source.storageLevel.useMemory  # cached for the fan-out
    assert parts["t_a"].count() == 2 and parts["t_b"].count() == 1
    parts.unpersist()
    assert not parts._source  # released
