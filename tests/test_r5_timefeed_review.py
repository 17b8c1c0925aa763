"""Changefeed/timeseries/stateful review hardening (round-5 final review):
exact ns conversion, unit validation, tz-independent sessionization,
null-timestamp cutover completeness, marker-collision guard, and the
stateful NaN guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.changefeed import (
    bootstrap_handoff,
    log_asof_prefix,
    snapshot_diff,
)
from kafka_connect_tablestore_spark.operators.timeseries import (
    TimeseriesConfig,
    sessionize,
    timeseries_transform,
    to_tall_skinny,
)


def test_nanosecond_conversion_is_exact_at_epoch_scale(spark):
    """Real epoch-ns magnitudes: float division's ~256 ns ulp at 1e18 must
    not shift the microsecond value."""
    ns = 1_700_000_000_123_456_789
    df = spark.createDataFrame([(ns, "d", 1.0)], "time long, datasource string, v double")
    cfg = TimeseriesConfig(time_unit="ns", field_cols=("v",))
    out = timeseries_transform(df, cfg).collect()[0]
    assert out["_time_us"] == ns // 1000  # 1_700_000_000_123_456 exactly


def test_unknown_time_unit_raises_value_error(spark):
    df = spark.createDataFrame([(1, "d")], "time long, datasource string")
    with pytest.raises(ValueError, match="time_unit"):
        timeseries_transform(df, TimeseriesConfig(time_unit="micros"))


def test_to_tall_skinny_validates_field_cols(spark):
    df = spark.createDataFrame([(1, "d")], "time long, datasource string")
    ts = timeseries_transform(df, TimeseriesConfig(time_unit="ms"))
    with pytest.raises(ValueError, match="at least one"):
        to_tall_skinny(ts, ())


def test_sessionize_timestamp_input_is_timezone_independent(spark):
    """A tz-aware TIMESTAMP column spanning a DST jump must not fake a gap:
    two events 10 real minutes apart stay in one session regardless of the
    session timezone."""
    # 2026-03-08 06:55 UTC and 07:05 UTC straddle the US spring-forward
    rows = [(1, "2026-03-08 06:55:00", "e1", 1.0), (1, "2026-03-08 07:05:00", "e2", 1.0)]
    df = spark.createDataFrame(rows, "user_id long, s string, event_id string, value double")
    df = df.withColumn("ts", F.to_timestamp("s")).drop("s")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        out = sessionize(df, gap_seconds=1800).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    assert len(out) == 1 and out[0]["n_events"] == 2  # one session, no DST split


def test_asof_prefix_and_suffix_partition_null_timestamps(spark):
    """prefix ∪ suffix must equal the log even when some clean events carry
    a null timestamp (they order before everything → prefix)."""
    rows = [(None, 0), (5, 1), (10, 2), (20, 3)]
    log = spark.createDataFrame(rows, "commit_ts long, offset long")
    pre = log_asof_prefix(log, fraction=0.5)  # bound = 5 + floor(15*0.5) = 12
    suf = log_asof_prefix(log, fraction=0.5, keep="suffix")
    pre_off = {r["offset"] for r in pre.collect()}
    suf_off = {r["offset"] for r in suf.collect()}
    assert pre_off == {0, 1, 2} and suf_off == {3}
    assert pre_off | suf_off == {0, 1, 2, 3} and not (pre_off & suf_off)


def test_snapshot_diff_allows_attr_named_present(spark):
    old = spark.createDataFrame([("r", "p", True)], "repo string, path string, present boolean")
    new = spark.createDataFrame([("r", "p", False)], "repo string, path string, present boolean")
    out = snapshot_diff(old, new, ("repo", "path"), ("present",)).collect()
    assert len(out) == 1 and out[0]["change_op"] == "UPDATE" and out[0]["present"] is False
    with pytest.raises(ValueError, match="reserved"):
        snapshot_diff(old, new, ("repo", "path"), ("__present__",))
