"""Compaction/vacuum, timeseries transform (S18), auto-increment PK (S6) and
key/value merge (S9) coverage."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.operators.keys import with_auto_increment
from kafka_connect_tablestore_spark.operators.projection import merge_key_value
from kafka_connect_tablestore_spark.operators.timeseries import (
    TimeseriesConfig,
    timeseries_transform,
    to_tall_skinny,
)
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def sig(engine):
    return {(r["repo"], r["path"]): r["content_sha256"] for r in engine.state().collect()}


def test_compact_drops_old_tombstones_and_merges_files(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 3000, seed=51, p_delete=0.3).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path))
    eng.replay(events, n_batches=4)
    before = sig(eng)
    meta_before = eng.table.read(include_meta=True)
    n_tomb = meta_before.where("_deleted").count()
    assert n_tomb > 0

    hi_ts = events.agg(F.max("commit_ts")).first()[0]
    res = eng.table.compact(tombstone_watermark_ts=hi_ts + 1)
    assert sig(eng) == before  # live state unchanged
    assert eng.table.read(include_meta=True).where("_deleted").count() == 0
    # every bucket now has exactly one directory (single fragment)
    snap = eng.table.snapshot()
    assert all(len(ds) == 1 for ds in snap["buckets"].values())
    assert snap["compacted"] and snap["version"] == res["version"]

    removed = eng.table.vacuum()
    assert removed  # superseded per-batch snapshots deleted
    assert sig(eng) == before  # still readable after vacuum

    # merges after compaction still work
    more = synth_changelog(spark, 500, seed=52)
    eng.apply_batch(more, "post-compact")
    assert eng.table.current_version() == res["version"] + 1


def test_compact_keeps_recent_tombstones(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 1000, seed=53, p_delete=0.3).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path))
    eng.apply_batch(events, "b0")
    eng.table.compact(tombstone_watermark_ts=0)  # nothing old enough
    assert eng.table.read(include_meta=True).where("_deleted").count() > 0


def test_timeseries_transform(spark):
    """S18: measurement/datasource/tags/time-unit/fields mapping
    (TimeseriesTransformer.java:35-209)."""
    df = spark.createDataFrame(
        [("click", 7, 1700000000123, 2.5, "X")],
        "event_type string, user_id int, t_ms long, Value double, Region string",
    )
    cfg = TimeseriesConfig(
        measurement_field="event_type",
        datasource_field="user_id",
        tag_fields=("Region",),
        time_field="t_ms",
        time_unit="ms",
        field_cols=("Value",),
        lowercase_fields=True,
    )
    r = timeseries_transform(df, cfg).first()
    assert r["_measurement"] == "click"
    assert r["_datasource"] == "7"
    assert r["_tags"] == {"Region": "X"} and r["_tags_str"] == "Region=X"
    assert r["_time_us"] == 1700000000123000  # ms -> us
    assert r["value"] == 2.5  # lowercased field name

    # literal-topic measurement (config absent => "<topic>")
    cfg2 = TimeseriesConfig(
        measurement_field=None, datasource_field="user_id",
        time_field="t_ms", time_unit="s", field_cols=("Value",),
        topic_literal="repos",
    )
    r2 = timeseries_transform(df, cfg2).first()
    assert r2["_measurement"] == "repos"
    assert r2["_time_us"] == 1700000000123 * 1_000_000

    tall = to_tall_skinny(timeseries_transform(df, cfg), ("value",)).first()
    assert tall["field"] == "value" and tall["value"] == "2.5"


def test_auto_increment_pk_fills_missing(spark):
    """S6: missing auto_increment PK -> unique placeholder
    (DefaultEventParser.java:86-94)."""
    df = spark.createDataFrame([("a", None), ("b", None), ("c", 7)], "k string, seq long")
    out = with_auto_increment(df, "seq").collect()
    vals = [r["seq"] for r in out]
    assert len(set(vals)) == 3 and 7 in vals  # unique; explicit value kept


def test_key_value_merge_order():
    """S9: value fields first, key fields overwrite on clash
    (DefaultEventParser.java:156-214)."""
    assert merge_key_value(["a", "b", "k1"], ["k1", "k2"]) == ["a", "b", "k1", "k2"]
