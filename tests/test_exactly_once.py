"""Exactly-once + crash-resume (SURVEY §2 S19 north-rule upgrade).

The reference is at-least-once (offsets committed after flush,
``TableStoreSinkWriter.java:244-270``) and relies on PK-overwrite idempotency.
Our upgrade: each snapshot embeds the batch manifest; re-applying a committed
batch_id is a no-op; a crash between data write and pointer swap leaves the
old snapshot visible (orphan data files only) and the replayed batch commits
deterministically."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

ATTRS = ("commit", "lang", "content")


def state_sig(engine):
    return {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in engine.state().collect()
    }


def test_duplicate_batch_is_skipped(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 2000, seed=5).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path))
    m1 = eng.apply_batch(events, "b-0")
    sig = state_sig(eng)
    m2 = eng.apply_batch(events, "b-0")  # redelivery after crash-post-commit
    assert m2["skipped"] and not m1["skipped"]
    assert state_sig(eng) == sig
    assert eng.table.current_version() == m1["committed_at_version"]


def test_crash_resume_mid_replay(spark, tmp_path):
    """Apply batches 0..1, 'crash', restart with a new engine, replay all 4:
    0..1 skipped, 2..3 applied; final state equals an uninterrupted run."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 4000, seed=6).cache()
    lo, hi = events.select(F.min("offset"), F.max("offset")).first()
    span = (hi - lo + 1 + 3) // 4

    def batch(k):
        return events.where(
            (F.col("offset") >= lo + k * span) & (F.col("offset") < lo + (k + 1) * span)
        )

    eng = CdcEngine(spark, cfg, str(tmp_path) + "/a")
    eng.apply_batch(batch(0), "replay-0")
    eng.apply_batch(batch(1), "replay-1")
    # ... crash; new process:
    eng2 = CdcEngine(spark, cfg, str(tmp_path) + "/a")
    ms = eng2.replay(events, n_batches=4)
    assert [m["skipped"] for m in ms] == [True, True, False, False]

    ref = CdcEngine(spark, cfg, str(tmp_path) + "/b")
    ref.replay(events, n_batches=4)
    assert state_sig(eng2) == state_sig(ref)


def test_crash_before_pointer_swap_is_invisible(spark, tmp_path):
    """Simulate a crash after data files land but before the pointer swap:
    the table still reads the old snapshot; re-applying commits cleanly."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 1500, seed=8).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path))
    eng.apply_batch(events.where(F.col("offset") < 700), "b-0")
    v = eng.table.current_version()
    sig = state_sig(eng)

    # crash sim: write the would-be snapshot data dir only (no meta/pointer)
    orphan = os.path.join(eng.table.dir, "data", "snap999999")
    events.limit(10).write.mode("overwrite").parquet(orphan)
    assert eng.table.current_version() == v
    assert state_sig(eng) == sig  # orphan files are invisible

    m = eng.apply_batch(events.where(F.col("offset") >= 700), "b-1")
    assert not m["skipped"] and eng.table.current_version() == v + 1


def test_manifest_lineage_per_partition(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW, lineage_per_partition=True)
    events = synth_changelog(spark, 3000, seed=9, n_partitions=4).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path))
    m = eng.apply_batch(events, "b-0")
    # per-partition offset ranges + row counts; rows sum to clean-event count
    parts = m["partitions"]
    assert set(parts) <= {"0", "1", "2", "3"}
    total = sum(p["rows"] for p in parts.values())
    assert total == events.count()  # no malformed events in this log
    for p in parts.values():
        assert p["start_offset"] <= p["end_offset"]


def test_empty_batch_commits_cleanly(spark, tmp_path):
    """foreachBatch can deliver empty micro-batches: both lineage paths must
    commit a valid (empty) manifest and leave state untouched."""
    from kafka_connect_tablestore_spark.config import RuntimeErrorTolerance

    events = synth_changelog(spark, 500, seed=10).cache()
    empty = events.where("offset < 0")
    for flag in (True, False):
        cfg = SinkConfig(delete_mode=DeleteMode.ROW, lineage_per_partition=flag)
        eng = CdcEngine(spark, cfg, str(tmp_path / f"lp{flag}"))
        eng.apply_batch(events, "b0")
        sig = state_sig(eng)
        m = eng.apply_batch(empty, "b1-empty")
        assert not m["skipped"]
        assert state_sig(eng) == sig
        # committed: re-applying the empty batch is now a skip
        assert eng.apply_batch(empty, "b1-empty")["skipped"]
