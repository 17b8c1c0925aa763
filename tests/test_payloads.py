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


def test_dynamic_map_typing_number_forms(spark):
    """The full textual Number surface a JSON parser produces
    (``ColumnCoverterUtil.java:79-92`` sees the parsed object, so every
    parse-able numeric literal must type as DOUBLE): scientific notation,
    leading '+', bare '.5' / '5.' forms — and the near-misses stay STRING."""
    numbers = {
        "1e5": 1e5, "1E5": 1e5, "-2.5e-3": -2.5e-3, "+3": 3.0,
        "+1.5E+2": 150.0, ".5": 0.5, "5.": 5.0, "-.25": -0.25, "007": 7.0,
    }
    strings = ["+", "-", ".", "e5", "1e", "1e+", "1.2.3", "NaN",
               "Infinity", "0x1f", "1_000", " 1", "1 ", ""]
    rows = [(i, {"v": s}) for i, s in enumerate([*numbers, *strings])]
    df = spark.createDataFrame(rows, "event_id long, value_map map<string,string>")
    got = {
        rows[r["event_id"]][1]["v"]: (r["dyn_type"], r["v_double"], r["v_string"])
        for r in explode_map_payload(df, ("event_id",)).collect()
    }
    for s, want in numbers.items():
        assert got[s] == ("double", want, None), s
    for s in strings:
        assert got[s] == ("string", None, s), s


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


# ----------------------------------------------------- key/value merge (S9)
def _kv_df(spark):
    """Kafka-shaped records: key struct carries the PK + a clashing field."""
    rows = [
        (0, 100, ("r1", "a", "key-src"), ("r1", "x", "c1", "from-value", "v-only")),
        (1, 200, ("r1", "b", "key-src"), ("zz", "y", "c2", "from-value", "v-only")),
    ]
    return spark.createDataFrame(
        rows,
        "offset long, commit_ts long, "
        "key struct<repo:string, path:string, shared:string>, "
        "value struct<repo:string, path:string, commit:string, shared:string, note:string>",
    )


def test_key_value_merge_record_key(spark):
    """pk_mode=record_key: PK from the key struct; attribute bag = value
    fields then key fields, key overwriting on clash; PK names dropped
    (DefaultEventParser.java:107-214)."""
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    cfg = SinkConfig(pk_mode=PrimaryKeyMode.RECORD_KEY)
    out = parse_key_value(_kv_df(spark), cfg)
    assert out.columns == ["offset", "commit_ts", "repo", "path", "commit", "shared", "note"]
    rows = {r["offset"]: r.asDict() for r in out.collect()}
    # PK comes from the KEY side ('r1','a'), not the value's ('r1','x')
    assert (rows[0]["repo"], rows[0]["path"]) == ("r1", "a")
    assert (rows[1]["repo"], rows[1]["path"]) == ("r1", "b")
    # clash: key's 'shared' overwrites value's
    assert rows[0]["shared"] == "key-src"
    assert rows[0]["note"] == "v-only" and rows[0]["commit"] == "c1"


def test_key_value_merge_record_value(spark):
    """pk_mode=record_value: PK from the value struct; key fields still
    overwrite the attribute bag on clash."""
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    cfg = SinkConfig(pk_mode=PrimaryKeyMode.RECORD_VALUE)
    out = parse_key_value(_kv_df(spark), cfg)
    rows = {r["offset"]: r.asDict() for r in out.collect()}
    assert (rows[1]["repo"], rows[1]["path"]) == ("zz", "y")
    assert rows[1]["shared"] == "key-src"  # key overwrites even in value mode


def test_key_value_whitelist_filters_attrs(spark):
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    cfg = SinkConfig(pk_mode=PrimaryKeyMode.RECORD_KEY, column_whitelist=("note",))
    out = parse_key_value(_kv_df(spark), cfg)
    assert out.columns == ["offset", "commit_ts", "repo", "path", "note"]


def test_key_value_string_key_side(spark):
    """STRING-shaped key + pk_mode=record_value: key contributes a 'key'
    column (DefaultEventParser.java:191-195)."""
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    df = spark.createDataFrame(
        [(0, "raw-key", ("r1", "a", "c1"))],
        "offset long, key string, value struct<repo:string, path:string, commit:string>",
    )
    cfg = SinkConfig(pk_mode=PrimaryKeyMode.RECORD_VALUE)
    out = parse_key_value(df, cfg)
    row = out.first().asDict()
    assert row["key"] == "raw-key" and (row["repo"], row["path"]) == ("r1", "a")
    # but with record_key the string key cannot carry named PK fields
    with pytest.raises(TypeError, match="STRUCT"):
        parse_key_value(df, SinkConfig(pk_mode=PrimaryKeyMode.RECORD_KEY))


def test_key_value_strict_pk_type_check(spark):
    """A record PK field with the wrong type class raises
    (DefaultEventParser.java:142-149)."""
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    df = spark.createDataFrame(
        [(0, (7, "a"), ("x",))],
        "offset long, key struct<repo:long, path:string>, value struct<commit:string>",
    )
    with pytest.raises(TypeError, match="strict PK type check"):
        parse_key_value(df, SinkConfig(pk_mode=PrimaryKeyMode.RECORD_KEY))


def test_key_value_absent_pk_field_is_null(spark):
    """A PK field absent from the payload struct surfaces as null (errant at
    the S14 gate), mirroring the per-record throw at
    DefaultEventParser.java:130-138."""
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    df = spark.createDataFrame(
        [(0, ("r1",), ("c1", "note"))],
        "offset long, key struct<repo:string>, value struct<commit:string, note:string>",
    )
    out = parse_key_value(df, SinkConfig(pk_mode=PrimaryKeyMode.RECORD_KEY))
    row = out.first().asDict()
    assert row["repo"] == "r1" and row["path"] is None


# ------------------------------------------- MapSchemaTest PK-type matrix
def test_map_payload_pk_type_matrix(spark):
    """Port of ``functiontest/MapSchemaTest.java`` (testNullSchema*Pk /
    testMapSchema*Pk): every scalar payload shape used as the primary key
    under each declared PK type.  TableStore PKs are string/integer/binary
    only; the reference parses the map value into the declared type and
    throws on an unparseable value — here the declared cast yields the typed
    PK column, with TYPE_MISMATCH feeding the S14 gate instead of a throw."""
    rows = [
        # (id, payload-value)               reference source-type analogue
        (1, "test"),        # string
        (2, "1"),           # byte/short/int/long (schemaless JSON: one shape)
        (3, "1.5"),         # float/double
        (4, "true"),        # boolean
        (5, "-7"),          # negative integer
    ]
    df = spark.createDataFrame(
        [(i, {"pk": v, "other": "x"}) for i, v in rows],
        "event_id long, value_map map<string,string>",
    )

    def parsed(decl):
        return {
            r["event_id"]: (r["pk"], r["error_info"])
            for r in parse_map_payload(df, SinkConfig(), {"pk": decl}).collect()
        }

    # declared string: every scalar shape round-trips as its string form
    got = parsed("string")
    assert got == {
        1: ("test", None), 2: ("1", None), 3: ("1.5", None),
        4: ("true", None), 5: ("-7", None),
    }

    # declared integer (long lattice): integral strings parse; float/bool/
    # free text are the reference's NumberFormatException -> errant
    got = parsed("long")
    assert got[2] == (1, None) and got[5] == (-7, None)
    for bad in (1, 3, 4):
        assert got[bad][0] is None and got[bad][1] == "TYPE_MISMATCH:pk"

    # declared binary: any string payload has a byte form (utf8), never errant
    got = parsed("binary")
    assert got[1] == (bytearray(b"test"), None)
    assert all(err is None for (_, err) in got.values())


def test_map_payload_multi_pk(spark):
    """MapSchemaTest.testMapSchemaMultiPk: two PK fields pulled from one map
    payload, independently typed, both feeding the fold key."""
    df = spark.createDataFrame(
        [(1, {"r": "repo_a", "n": "42", "attr": "v"})],
        "event_id long, value_map map<string,string>",
    )
    out = parse_map_payload(
        df, SinkConfig(), {"r": "string", "n": "long", "attr": "string"}
    ).first()
    assert (out["r"], out["n"], out["attr"], out["error_info"]) == (
        "repo_a", 42, "v", None,
    )
