"""LWW ordering contract (SURVEY §2 S12).

Golden test ported from ``TableStoreWriterTest.java:93-104``: 1000 sequential
updates to one primary key — the final value must be the last one ("999").
Also proves all three LWW strategies (window / max_by / salted two-phase)
agree on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.lww import (
    lww_dedup_maxby,
    lww_dedup_salted,
    lww_dedup_window,
)
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def test_1000_updates_one_key_last_wins(spark):
    rows = [("r", "p", 1000 + i, i, f"v{i}") for i in range(1000)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit_ts long, offset long, content string"
    )
    for fn in (lww_dedup_window, lww_dedup_maxby, lww_dedup_salted):
        out = fn(df, ("repo", "path")).collect()
        assert len(out) == 1
        assert out[0]["content"] == "v999"


def test_strategies_agree_on_skewed_log(spark):
    df = synth_changelog(spark, 5000, seed=3, n_repos=10, skew=4.0).select(
        "repo", "path", "commit_ts", "offset", "op", "content"
    )
    a = {tuple(r) for r in lww_dedup_window(df).collect()}
    b = {tuple(r) for r in lww_dedup_maxby(df).collect()}
    c = {tuple(r) for r in lww_dedup_salted(df, n_salts=4).collect()}
    assert a == b == c and len(a) > 0


def test_tie_break_on_offset(spark):
    # same commit_ts: higher offset wins (the reference's physical order)
    rows = [("r", "p", 5000, 1, "first"), ("r", "p", 5000, 2, "second")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit_ts long, offset long, content string"
    )
    assert lww_dedup_maxby(df, ("repo", "path")).first()["content"] == "second"
