"""SCD2 history intervals and as-of enrichment (operators/changefeed.py).

The history leg of the CDC lake: version intervals from the change log,
and event-time state lookup without a range join.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.changefeed import (
    asof_enrich,
    scd2_history,
)
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

LOG_SCHEMA = (
    "topic string, partition int, offset long, commit_ts long, op string, "
    "repo string, path string, commit string, lang string, content string"
)


def _log(spark, rows):
    return spark.createDataFrame(rows, schema=LOG_SCHEMA)


def _mklog(spark):
    # key A: PUT@10 -> UPDATE@20 -> DELETE@30 ; key B: PUT@15, still open
    rows = [
        ("t", 0, 1, 10, "PUT", "rA", "p", "c1", "py", "v1"),
        ("t", 0, 2, 20, "UPDATE", "rA", "p", "c2", "go", "v2"),
        ("t", 0, 3, 30, "DELETE", "rA", "p", None, None, None),
        ("t", 0, 4, 15, "PUT", "rB", "p", "c9", "py", "w1"),
    ]
    return _log(spark, rows)


def test_scd2_intervals_and_current_flag(spark):
    hist = scd2_history(_mklog(spark)).orderBy("repo", "valid_from").collect()
    assert [
        (r.repo, r.commit, r.valid_from, r.valid_to, r.is_current) for r in hist
    ] == [
        ("rA", "c1", 10, 20, False),
        ("rA", "c2", 20, 30, False),  # closed by the DELETE, no current row
        ("rB", "c9", 15, None, True),
    ]


def test_scd2_tiebreak_is_offset_within_equal_ts(spark):
    rows = [
        ("t", 0, 7, 10, "PUT", "r", "p", "late", None, "y"),
        ("t", 0, 5, 10, "PUT", "r", "p", "early", None, "x"),
    ]
    hist = scd2_history(_log(spark, rows)).orderBy("valid_from", "commit").collect()
    by_commit = {r.commit: r for r in hist}
    assert by_commit["early"].valid_to == 10 and not by_commit["early"].is_current
    assert by_commit["late"].valid_to is None and by_commit["late"].is_current


def test_asof_enrich_visibility_and_delete(spark):
    log = _mklog(spark)
    facts = spark.createDataFrame(
        [
            (100, "rA", "p", 5),   # before any version -> nulls
            (101, "rA", "p", 20),  # change AT fact ts is visible (dim first)
            (102, "rA", "p", 25),  # between update and delete -> v2
            (103, "rA", "p", 35),  # after the delete -> nulls again
            (104, "rB", "p", 16),  # open version
        ],
        schema=["offset", "repo", "path", "fact_ts"],
    )
    out = {
        r.fact_id: (r.asof_commit, r.asof_lang, r.asof_content)
        for r in asof_enrich(facts, log).collect()
    }
    assert out[100] == (None, None, None)
    assert out[101] == ("c2", "go", "v2")
    assert out[102] == ("c2", "go", "v2")
    assert out[103] == (None, None, None)
    assert out[104] == ("c9", "py", "w1")


def test_asof_enrich_agrees_with_history_interval_lookup(spark):
    """On a 3k-event synthetic log, the window-based as-of fill must equal
    the declarative interval lookup against scd2_history — two independent
    formulations of the same semantics."""
    log = synth_changelog(spark, 3000, n_repos=12, paths_per_repo=4).cache()
    lo, hi = log.agg(F.min("commit_ts"), F.max("commit_ts")).first()
    span = [lo - 1] + [lo + (hi - lo) * k // 3 for k in range(1, 3)] + [hi + 1]
    facts = (
        log.select("repo", "path")
        .distinct()
        .crossJoin(
            spark.createDataFrame([(t,) for t in span], schema=["fact_ts"])
        )
        .withColumn(
            "offset",
            F.row_number()
            .over(Window.orderBy("repo", "path", "fact_ts"))
            .cast("long"),
        )
    ).cache()

    got = asof_enrich(facts, log).select(
        "fact_id", "repo", "path", "asof_commit", "asof_lang", "asof_content"
    )

    hist = scd2_history(log)
    expected = (
        facts.alias("f")
        .join(
            hist.alias("h"),
            (F.col("f.repo") == F.col("h.repo"))
            & (F.col("f.path") == F.col("h.path"))
            & (F.col("h.valid_from") <= F.col("f.fact_ts"))
            & (
                F.col("h.valid_to").isNull()
                | (F.col("h.valid_to") > F.col("f.fact_ts"))
            ),
            "left",
        )
        .select(
            F.col("f.offset").alias("fact_id"),
            F.col("f.repo").alias("repo"),
            F.col("f.path").alias("path"),
            F.col("h.commit").alias("asof_commit"),
            F.col("h.lang").alias("asof_lang"),
            F.col("h.content").alias("asof_content"),
        )
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    assert got.count() == facts.count()


def test_asof_enrich_plan_is_single_window_no_join(spark):
    log = _mklog(spark)
    facts = spark.createDataFrame(
        [(1, "rA", "p", 25)], schema=["offset", "repo", "path", "fact_ts"]
    )
    plan = asof_enrich(facts, log)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a range join
    assert "BatchEvalPython" not in plan


def test_log_asof_prefix_midpoint_bound_and_plan(spark):
    from kafka_connect_tablestore_spark.operators.changefeed import (
        log_asof_prefix,
    )

    rows = [
        ("t", 0, 1, 10, "PUT", "rA", "p", "c1", "py", "v1"),
        ("t", 0, 2, 20, "PUT", "rA", "p", "c2", "py", "v2"),
        ("t", 0, 3, 30, "PUT", "rA", "p", "c3", "py", "v3"),
        ("t", 0, 4, 31, "PUT", "rB", "p", "c4", "py", "v4"),
    ]
    log = _log(spark, rows)
    # span 10..31 -> midpoint 10 + (21 div 2) = 20: offsets 1 and 2 survive
    got = log_asof_prefix(log).select("offset").orderBy("offset").collect()
    assert [r.offset for r in got] == [1, 2]
    # fraction=1.0 keeps everything; 0.0 keeps only the min-ts event
    assert log_asof_prefix(log, fraction=1.0).count() == 4
    assert log_asof_prefix(log, fraction=0.0).count() == 1
    # the scalar bound must be broadcast, never a driver collect or a
    # shuffled join
    plan = log_asof_prefix(log)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_log_asof_prefix_rejects_bad_fraction(spark):
    import pytest

    from kafka_connect_tablestore_spark.operators.changefeed import (
        log_asof_prefix,
    )

    with pytest.raises(ValueError):
        log_asof_prefix(_mklog(spark), fraction=1.5)


def test_dedup_redelivered_makes_replay_idempotent(spark):
    from kafka_connect_tablestore_spark.operators.monitor import (
        dedup_redelivered,
    )

    log = _mklog(spark)
    # at-least-once: redeliver every record once, and one of them twice
    dup = log.unionByName(log).unionByName(log.where(F.col("offset") == 2))
    deduped = dedup_redelivered(dup)
    assert deduped.count() == log.count()
    base = {tuple(r) for r in log.collect()}
    assert {tuple(r) for r in deduped.collect()} == base


def test_log_asof_prefix_survives_microsecond_scale_spans(spark):
    """A naive span*1e6 product wraps int64 for microsecond logs spanning
    months; the split-scaling bound must keep the exact floor semantics."""
    from kafka_connect_tablestore_spark.operators.changefeed import (
        log_asof_prefix,
    )

    base = 1_700_000_000_000_000  # epoch micros
    span = 20_000_000_000_000  # ~231 days in micros: span*5e5 would wrap
    rows = [
        ("t", 0, 1, base, "PUT", "r", "p1", "c1", "py", "v1"),
        ("t", 0, 2, base + span // 2, "PUT", "r", "p2", "c2", "py", "v2"),
        ("t", 0, 3, base + span, "PUT", "r", "p3", "c3", "py", "v3"),
    ]
    log = _log(spark, rows)
    got = sorted(
        r.offset for r in log_asof_prefix(log).select("offset").collect()
    )
    assert got == [1, 2]  # midpoint bound lands exactly on the middle event
    assert log_asof_prefix(log, fraction=1.0).count() == 3
