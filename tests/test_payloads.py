"""MAP / STRING payload shapes + the pluggable EventParser seam.

Port of the schemaless cases in ``DefaultEventParserTest.java`` (map value
typing, string payload → ``value`` column, whitelist type mismatch) onto the
Spark-native operators, plus the ``event.parse.class`` equivalent
(``SinkConfig.event_parser``) feeding the fold end-to-end.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.operators.payloads import (
    check_declared_struct_types,
    explode_map_payload,
    parse_map_payload,
    parse_string_payload,
)


def _map_df(spark):
    rows = [
        (1, {"a": "42", "b": "true", "c": "hello", "d": "-3.5"}),
        (2, {"a": "oops", "b": "false", "c": "7"}),
        (3, {"a": None, "b": "TRUE"}),  # null value; case-sensitive boolean
    ]
    return spark.createDataFrame(rows, "event_id long, value_map map<string,string>")


# ------------------------------------------------------------- dynamic typing
def test_dynamic_map_typing_matrix(spark):
    """ColumnCoverterUtil.java:79-92: Number→DOUBLE, Boolean→BOOLEAN, else
    STRING — per VALUE, not per field."""
    out = {
        (r["event_id"], r["field"]): (
            r["dyn_type"], r["v_double"], r["v_boolean"], r["v_string"]
        )
        for r in explode_map_payload(_map_df(spark), ("event_id",)).collect()
    }
    assert out[(1, "a")] == ("double", 42.0, None, None)
    assert out[(1, "b")] == ("boolean", None, True, None)
    assert out[(1, "c")] == ("string", None, None, "hello")
    assert out[(1, "d")] == ("double", -3.5, None, None)
    assert out[(2, "a")] == ("string", None, None, "oops")  # same field, other type
    assert out[(2, "c")] == ("double", 7.0, None, None)
    assert out[(3, "b")] == ("string", None, None, "TRUE")  # JSON booleans are lowercase
    assert out[(3, "a")][0] == "string" and out[(3, "a")][3] is None  # null value


# ------------------------------------------------------- declared (whitelist)
def test_declared_map_types_and_mismatch(spark):
    out = {
        r["event_id"]: r.asDict()
        for r in parse_map_payload(
            _map_df(spark), SinkConfig(), declared={"a": "long", "c": "string"}
        ).collect()
    }
    assert out[1]["a"] == 42 and out[1]["c"] == "hello" and out[1]["error_info"] is None
    # 'oops' does not cast to long → first-mismatch errant (the reference
    # throws at the first bad field, DefaultEventParser.java:144-149)
    assert out[2]["error_info"] == "TYPE_MISMATCH:a"
    # absent/null whitelisted fields are skipped, not errors (:304-346)
    assert out[3]["a"] is None and out[3]["error_info"] is None


def test_declared_int_widths_collapse(spark):
    """int8..64 all land in the long class (ColumnCoverterUtil.java:57-76)."""
    df = spark.createDataFrame([(1, {"n": "127"})], "event_id long, value_map map<string,string>")
    for t in ("int8", "int16", "int32", "int64", "long"):
        row = parse_map_payload(df, SinkConfig(), declared={"n": t}).first()
        assert row["n"] == 127 and row["error_info"] is None


# -------------------------------------------------------------- string shape
def test_string_payload_value_and_key_side(spark):
    df = spark.createDataFrame([(1, "raw text")], "event_id long, payload string")
    v = parse_string_payload(df, "payload", side="value")
    assert v.columns == ["event_id", "value"] and v.first()["value"] == "raw text"
    k = parse_string_payload(df, "payload", side="key")
    assert k.columns == ["event_id", "key"]
    with pytest.raises(ValueError):
        parse_string_payload(df, "payload", side="header")


# ------------------------------------------------------- struct strict check
def test_struct_strict_type_check(spark):
    df = spark.createDataFrame([(1, 2.5, "x")], "a int, b double, c string")
    # class-equal declarations accepted (int32 vs declared int64 = same class)
    check_declared_struct_types(df, {"a": "int64", "b": "float32", "c": "string"})
    # class mismatch rejected (DefaultEventParser.java:333-339)
    with pytest.raises(TypeError, match="strict check"):
        check_declared_struct_types(df, {"b": "int64"})
    # absent fields are skipped (whitelist semantics)
    check_declared_struct_types(df, {"zzz": "long"})


# ----------------------------------------------------------- EventParser seam
def test_custom_event_parser_feeds_fold(spark, tmp_path):
    """A user parser (event.parse.class equivalent) turning a raw 'wire'
    column into engine events must produce the same final state as feeding
    pre-structured events."""
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog

    events = synth_changelog(spark, 2000, seed=21).cache()
    wire = events.select(
        "topic", "partition", "offset", "commit_ts", "op",
        F.concat_ws(
            "\x1f", "repo", "path",
            F.coalesce(F.col("commit"), F.lit("\x00")),
            F.coalesce(F.col("lang"), F.lit("\x00")),
            F.coalesce(F.col("content"), F.lit("\x00")),
        ).alias("raw"),
    )

    def parser(df):
        parts = F.split(F.col("raw"), "\x1f")

        def fld(i):
            v = F.get(parts, i)
            return F.when(v == "\x00", F.lit(None)).otherwise(v)

        return df.select(
            "topic", "partition", "offset", "commit_ts", "op",
            fld(0).alias("repo"), fld(1).alias("path"),
            fld(2).alias("commit"), fld(3).alias("lang"), fld(4).alias("content"),
        )

    cfg = SinkConfig(delete_mode=DeleteMode.ROW, event_parser=parser)
    eng = CdcEngine(spark, cfg, str(tmp_path) + "/parsed")
    eng.apply_batch(wire, "b-0")

    ref = CdcEngine(spark, SinkConfig(delete_mode=DeleteMode.ROW), str(tmp_path) + "/direct")
    ref.apply_batch(events, "b-0")

    sig = lambda e: {  # noqa: E731
        (r["repo"], r["path"]): r["content_sha256"] for r in e.state().collect()
    }
    assert sig(eng) == sig(ref) and len(sig(eng)) > 0
