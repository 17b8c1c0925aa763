"""Unit tests for PK extraction (S3/S4/S5), routing (S2), projection/whitelist
(S7), casts (S8), and schema evolution — each mirroring the reference tests
named in the docstrings."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    InsertMode,
    PrimaryKeyMode,
    SinkConfig,
)
from kafka_connect_tablestore_spark.functions.casts import (
    cast_column_lattice,
    widened_type_name,
)
from kafka_connect_tablestore_spark.functions.hashing import content_sha256, sha256_pandas
from kafka_connect_tablestore_spark.operators.keys import pk_kafka, pk_search
from kafka_connect_tablestore_spark.operators.projection import project_attributes
from kafka_connect_tablestore_spark.operators.routing import route, with_target_table
from kafka_connect_tablestore_spark.plans.schema_evolution import (
    SchemaEvolutionError,
    evolve,
    widen,
)


@pytest.fixture()
def env_df(spark):
    return spark.createDataFrame(
        [("repos", 3, 42, 1000, "x")],
        "topic string, partition int, offset long, commit_ts long, payload string",
    )


def test_pk_kafka_mode(env_df):
    """RowChangeTransformer.java:112-125 — PK ('<topic>_<partition>', offset)."""
    r = pk_kafka(env_df).first()
    assert r["topic_partition"] == "repos_3" and r["offset"] == 42


def test_pk_search_mode(env_df):
    """RowChangeTransformer.java:92-104 — md5('<topic>_<part>_<offset>')[0:5]."""
    r = pk_search(env_df).first()
    expect = hashlib.md5(b"repos_3_42").hexdigest()[:5]
    assert r["md5"] == expect and r["timestamp"] == 1000


def test_routing_map_and_format(env_df):
    """TableStoreSinkConfig.java:715-737 — explicit map beats <topic> format."""
    cfg = SinkConfig(topic_table_map={"repos": "t_repos"}, table_name_format="tbl_<topic>")
    assert with_target_table(env_df, cfg).first()["target_table"] == "t_repos"
    cfg2 = SinkConfig(table_name_format="tbl_<topic>")
    assert with_target_table(env_df, cfg2).first()["target_table"] == "tbl_repos"


def test_route_splits_topics(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "topic string, offset long")
    parts = route(df, SinkConfig())
    assert set(parts) == {"a", "b"}
    assert parts["a"].count() == 2 and "target_table" not in parts["a"].columns


def test_whitelist_projection(spark):
    """WhiteListTest.java:84-156 — whitelist (A,B) ⇒ C never written; PK cols kept."""
    df = spark.createDataFrame(
        [("r", "p", "a", "b", "c")], "repo string, path string, A string, B string, C string"
    )
    cfg = SinkConfig(column_whitelist=("A", "B"))
    out = project_attributes(df, cfg, keep_envelope=False)
    assert out.columns == ["repo", "path", "A", "B"]


def test_cast_lattice(spark):
    """ColumnCoverterUtil.java:24-76 / DefaultEventParserTest.java type matrix:
    int8/16/32/64→long, float32/64→double, bytes→binary."""
    df = spark.range(1).select(
        F.lit(1).cast("tinyint").alias("byte"),
        F.lit(2).cast("smallint").alias("short"),
        F.lit(3).cast("int").alias("int"),
        F.lit(4).cast("bigint").alias("long"),
        F.lit(1.5).cast("float").alias("float"),
        F.lit(2.5).cast("double").alias("double"),
        F.lit("s").alias("string"),
        F.lit(True).alias("boolean"),
        F.lit(b"\x01").alias("bytes"),
    )
    out = cast_column_lattice(df)
    got = dict(out.dtypes)
    assert got == {
        "byte": "bigint", "short": "bigint", "int": "bigint", "long": "bigint",
        "float": "double", "double": "double", "string": "string",
        "boolean": "boolean", "bytes": "binary",
    }
    r = out.first()
    assert r["byte"] == 1 and r["float"] == 1.5


def test_nested_types_rejected():
    """Non-scalar payloads are errors (DefaultEventParserTest.java:594-628)."""
    with pytest.raises(TypeError):
        widened_type_name("array<string>")
    with pytest.raises(TypeError):
        widened_type_name("struct<a:int>")


def test_sha256_builtin_matches_pandas_udf(spark):
    df = spark.createDataFrame([("hello",), (None,)], "content string")
    got = df.select(
        content_sha256("content").alias("a"), sha256_pandas("content").alias("b")
    ).collect()
    assert got[0]["a"] == got[0]["b"] == hashlib.sha256(b"hello").hexdigest()
    assert got[1]["a"] is None and got[1]["b"] is None


def test_schema_widen_rules():
    """Widenings exactly per ColumnCoverterUtil.java:57-70; narrowing rejected
    like ParamChecker.java:41-65."""
    assert widen("int", "long") == "long"
    assert widen("float", "double") == "double"
    assert widen("long", "int") == "long"  # commutative: result is the wider
    with pytest.raises(SchemaEvolutionError):
        widen("string", "long")
    schema, changes = evolve({"a": "int"}, {"a": "long", "b": "string"})
    assert schema == {"a": "long", "b": "string"}
    assert changes == ["WIDEN a int->long", "ADD COLUMN b string"]


def test_pk_config_validation():
    with pytest.raises(ValueError):
        SinkConfig(pk_fields=("a",) * 5, pk_types=("string",) * 5)
    with pytest.raises(ValueError):
        SinkConfig(pk_types=("string", "double"))
    with pytest.raises(ValueError):
        SinkConfig(delete_mode=DeleteMode.ROW, pk_mode=PrimaryKeyMode.KAFKA)
