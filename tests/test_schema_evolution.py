"""Schema evolution end-to-end (fixture F6): additive column + widening
applied via the snapshot schema registry before the micro-batch merge;
narrowing rejected (upgrade of ``ParamChecker.java:24-97``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.plans.schema_evolution import SchemaEvolutionError
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

BASE_ATTRS = ("commit", "lang", "content")


def test_additive_column_mid_stream(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    e1 = synth_changelog(spark, 1000, seed=21).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path), attr_fields=BASE_ATTRS)
    m1 = eng.apply_batch(e1, "b-0")
    assert m1["schema_changes"] == [
        "ADD COLUMN commit string", "ADD COLUMN lang string", "ADD COLUMN content string"
    ]

    # from a known offset onward the producer adds stars:int (additive)
    e2 = synth_changelog(spark, 300, seed=22).withColumn(
        "stars", (F.col("offset") % 50).cast("int")
    )
    eng2 = CdcEngine(spark, cfg, str(tmp_path), attr_fields=BASE_ATTRS + ("stars",))
    m2 = eng2.apply_batch(e2, "b-1")
    assert m2["schema_changes"] == ["ADD COLUMN stars int"]

    st = eng2.state()
    assert dict(st.dtypes)["stars"] == "int"
    # pre-evolution keys read as NULL stars; post-evolution rows carry values
    assert st.where(F.col("stars").isNull()).count() > 0
    assert st.where(F.col("stars").isNotNull()).count() > 0

    # widening: a later batch sends stars as long
    e3 = synth_changelog(spark, 200, seed=23).withColumn(
        "stars", (F.col("offset") % 50).cast("long")
    )
    m3 = eng2.apply_batch(e3, "b-2")
    assert m3["schema_changes"] == ["WIDEN stars int->long"]
    assert dict(eng2.state().dtypes)["stars"] == "bigint"


def test_incompatible_change_rejected(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    e1 = synth_changelog(spark, 200, seed=24).withColumn("stars", F.lit(1).cast("long"))
    eng = CdcEngine(spark, cfg, str(tmp_path), attr_fields=BASE_ATTRS + ("stars",))
    eng.apply_batch(e1, "b-0")
    e2 = synth_changelog(spark, 100, seed=25).withColumn("stars", F.lit("x"))
    with pytest.raises(SchemaEvolutionError):
        eng.apply_batch(e2, "b-1")
    # failed batch must not have committed anything
    assert "b-1" not in eng.table.committed_batches()


def test_non_scalar_attr_type_rejected(spark, tmp_path):
    """Non-scalar / unsupported attribute types are errors, as in the
    reference (ColumnCoverterUtil.java:57-76)."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    e = synth_changelog(spark, 50, seed=26).withColumn(
        "stars", F.array(F.lit(1), F.lit(2))
    )
    eng = CdcEngine(spark, cfg, str(tmp_path), attr_fields=BASE_ATTRS + ("stars",))
    with pytest.raises(SchemaEvolutionError, match="unsupported attribute type"):
        eng.apply_batch(e, "b-0")
