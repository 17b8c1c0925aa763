"""Snapshot time-travel reads + watermarked event-time windowed aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog
from kafka_connect_tablestore_spark.streaming.stateful import windowed_change_counts


def test_time_travel_reads_each_version(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 2000, seed=7).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.replay(events, n_batches=2)

    v = eng.table.current_version()
    assert v == 2
    # v1 == replaying only the first offset slice into a fresh lake
    ref = CdcEngine(spark, cfg, str(tmp_path / "lake_ref"))
    lo, hi = events.select(F.min("offset"), F.max("offset")).first()
    span = (hi - lo + 1 + 1) // 2
    ref.replay(events.where(F.col("offset") < lo + span))
    key = lambda df: {(r["repo"], r["path"], r["content_sha256"]) for r in df.collect()}
    assert key(eng.state(version=1)) == key(ref.state())
    # v2 == the full replay; the default read is the latest version
    assert key(eng.state(version=2)) == key(eng.state())
    assert key(eng.state(version=1)) != key(eng.state(version=2))
    # snapshots() catalogs every retained version
    assert [s["version"] for s in eng.table.snapshots()] == [0, 1, 2]
    # un-vacuumed old versions survive compaction
    eng.table.compact()
    assert key(eng.state(version=1)) == key(ref.state())


def test_time_travel_missing_version_raises(spark, tmp_path):
    eng = CdcEngine(spark, SinkConfig(), str(tmp_path / "lake"))
    eng.replay(synth_changelog(spark, 100, seed=7))
    try:
        eng.state(version=99)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_windowed_change_counts_drops_late_and_finalizes(spark, tmp_path):
    """Append-mode watermark semantics: a window is emitted once its end is
    behind the watermark, and events arriving later than the watermark are
    dropped — the bounded-state contract for late CDC telemetry."""
    minute = 60_000
    schema = "commit_ts long, repo string, op string"
    batches = (
        [(0 * minute + 1, "r1", "PUT"), (0 * minute + 2, "r1", "DELETE")],
        # advances the watermark to 8 min — but the new watermark only takes
        # effect from the NEXT batch (Spark computes batch N's watermark
        # from data through batch N-1)
        [(10 * minute, "r2", "PUT")],
        # watermark now 8 min ⇒ window [0,1min) is evicted+emitted here
        [(10 * minute + 1, "r2", "PUT")],
        # late beyond the watermark, state already evicted ⇒ dropped
        [(0 * minute + 3, "r1", "PUT")],
    )
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        d = os.path.join(src, f"f{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        # the file source orders micro-batches by modification time; writes
        # land within the same timestamp tick, so pin strictly increasing
        # mtimes to make batch order (and thus watermark progression)
        # deterministic
        for root, _, files in os.walk(d):
            for fn in files:
                os.utime(os.path.join(root, fn), (1_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        windowed_change_counts(stream, window="1 minute", watermark="2 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r["repo"], r["window_start"].minute, r["n_events"], r["n_deletes"])
        for r in spark.sql("select * from win_counts").collect()
    }
    # window 0 finalized exactly once with the two on-time events ONLY (the
    # final batch's late event was dropped by the watermark); window 10 is
    # still open, not emitted
    assert got == {("r1", 0, 2, 1)}
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1


def test_changefeed_between_versions_applies_cleanly(spark, tmp_path):
    """table.changefeed(v1): applying the emitted row changes onto the v1
    state reproduces the current state exactly — the feed is a faithful
    version-to-version changelog."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 3000, seed=21).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.replay(events, n_batches=3)

    feed = eng.table.changefeed(1).cache()
    ops = {r["change_op"] for r in feed.select("change_op").distinct().collect()}
    assert ops and ops <= {"INSERT", "UPDATE", "DELETE"}

    attrs = sorted(eng.table.snapshot()["schema"])
    old = eng.table.read(version=1).select("repo", "path", *attrs)
    new = eng.table.read().select("repo", "path", *attrs)
    upserts = feed.where(F.col("change_op") != "DELETE").drop("change_op")
    applied = (
        old.join(feed.select("repo", "path"), ["repo", "path"], "left_anti")
        .unionByName(upserts)
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(applied) == key(new)
    # no-op feed: current vs current is empty
    assert eng.table.changefeed(eng.table.current_version()).count() == 0


def test_changefeed_across_schema_evolution(spark, tmp_path):
    """changefeed(from) where from_version predates an ADD COLUMN: the old
    side is null-padded with the registry type, so pre-evolution rows whose
    only change is the new column read as UPDATEs, untouched rows as none."""
    base = ("commit", "lang", "content")
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 2000, seed=13).cache()
    lo, hi = events.select(F.min("offset"), F.max("offset")).first()
    mid = lo + (hi - lo + 1) // 2

    eng = CdcEngine(spark, cfg, str(tmp_path), attr_fields=base)
    eng.apply_batch(events.where(F.col("offset") < mid), "b0")
    ev2 = events.where(F.col("offset") >= mid).withColumn(
        "stars", (F.col("offset") % 50).cast("int")
    )
    eng2 = CdcEngine(spark, cfg, str(tmp_path), attr_fields=base + ("stars",))
    m = eng2.apply_batch(ev2, "b1")
    assert m["schema_changes"] == ["ADD COLUMN stars int"]

    feed = eng2.table.changefeed(1).cache()
    assert "stars" in feed.columns
    ops = {r[0] for r in feed.select("change_op").distinct().collect()}
    assert "INSERT" in ops
    # applying the feed onto the null-padded old state reproduces current
    attrs = sorted(eng2.table.snapshot()["schema"])
    old = eng2.table.read(version=1)
    for c in attrs:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None).cast("int"))
    old = old.select("repo", "path", *attrs)
    new = eng2.table.read().select("repo", "path", *attrs)
    upserts = feed.where(F.col("change_op") != "DELETE").drop("change_op")
    applied = (
        old.join(feed.select("repo", "path"), ["repo", "path"], "left_anti")
        .unionByName(upserts)
    )
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))


def test_expire_snapshots_retains_window_and_bounds_metadata(spark, tmp_path):
    """Iceberg-style retention: keep_last=2 leaves the newest two versions
    fully time-travelable (including data dirs first written under expired
    versions but still referenced by retained bucket maps), drops the meta
    of everything older, and GCs only unreachable data directories."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 2000, seed=7).cache()
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.replay(events, n_batches=3)
    assert [s["version"] for s in eng.table.snapshots()] == [0, 1, 2, 3]

    # reference state at version 2 (first two of three offset slices)
    ref = CdcEngine(spark, cfg, str(tmp_path / "lake_ref"))
    lo, hi = events.select(F.min("offset"), F.max("offset")).first()
    span = (hi - lo + 1 + 3 - 1) // 3
    ref.replay(events.where(F.col("offset") < lo + 2 * span))
    key = lambda df: {(r["repo"], r["path"], r["content_sha256"]) for r in df.collect()}
    want_v2, want_v3 = key(ref.state()), key(eng.state())

    out = eng.table.expire_snapshots(keep_last=2)
    assert out["expired"] == [0, 1]
    # catalog now shows only the retained window
    assert [s["version"] for s in eng.table.snapshots()] == [2, 3]
    # both retained versions reconstruct exactly — batch-2 rows live in
    # data dirs written under the now-expired version 2's commit, proving
    # liveness came from retained bucket maps, not version numbers
    assert key(eng.state(version=2)) == want_v2
    assert key(eng.state(version=3)) == want_v3
    # changefeed across the retained window still works
    assert eng.table.changefeed(2, 3).count() > 0
    # expired versions read as missing snapshots, not mid-scan path errors
    try:
        eng.state(version=1)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError as e:
        assert "no snapshot" in str(e)

    # idempotent: a second run expires nothing and removes nothing
    again = eng.table.expire_snapshots(keep_last=2)
    assert again == {"expired": [], "removed_dirs": []}

    # keep_last=1 degenerates to the vacuum retention: current only
    eng.table.expire_snapshots(keep_last=1)
    assert [s["version"] for s in eng.table.snapshots()] == [3]
    assert key(eng.state()) == want_v3

    import pytest

    with pytest.raises(ValueError):
        eng.table.expire_snapshots(keep_last=0)


def test_expire_snapshots_gc_drops_compaction_superseded_dirs(spark, tmp_path):
    """After compact(), expire_snapshots(keep_last=1) removes every
    pre-compaction data directory (the compacted snapshot references only
    its own rewrite) while the compacted state stays byte-identical."""
    import os as _os

    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.replay(synth_changelog(spark, 1000, seed=11), n_batches=2)
    key = lambda df: {(r["repo"], r["path"], r["content_sha256"]) for r in df.collect()}
    want = key(eng.state())
    eng.table.compact()
    out = eng.table.expire_snapshots(keep_last=1)
    assert out["removed_dirs"], "pre-compaction dirs should be GC'd"
    data = _os.path.join(eng.table.dir, "data")
    v = eng.table.current_version()
    assert _os.listdir(data) == [f"snap{v:06d}"]
    assert key(eng.state()) == want


def test_rollback_rewinds_state_and_exactly_once_ledger(spark, tmp_path):
    """Bad-batch recovery: a garbage batch commits, rollback() restores the
    prior state metadata-only (history preserved), and — because the
    exactly-once ledger rewinds with the snapshot — the CORRECTED batch
    re-applies under the same batch_id instead of being skipped, after
    which the table equals a clean replay."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 2000, seed=13).cache()
    lo, hi = events.select(F.min("offset"), F.max("offset")).first()
    mid = lo + (hi - lo + 1) // 2
    good_head = events.where(F.col("offset") < mid)
    good_tail = events.where(F.col("offset") >= mid)
    # the "bad deploy": tail content corrupted before apply
    bad_tail = good_tail.withColumn(
        "content", F.concat(F.lit("CORRUPT:"), F.col("content"))
    )

    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.apply_batch(good_head, "b-0")
    eng.apply_batch(bad_tail, "b-1")
    key = lambda df: {(r["repo"], r["path"], r["content_sha256"]) for r in df.collect()}

    ref = CdcEngine(spark, cfg, str(tmp_path / "lake_ref"))
    ref.apply_batch(good_head, "b-0")
    want_head = key(ref.state())
    ref.apply_batch(good_tail, "b-1")
    want_full = key(ref.state())
    assert key(eng.state()) != want_full  # corruption landed

    out = eng.table.rollback(1)
    assert out == {"version": 3, "rolled_back_to": 1}
    # visible state is the pre-bad-batch table; the bad version stays
    # time-travelable for postmortem until expired
    assert key(eng.state()) == want_head
    assert key(eng.state(version=2)) != want_full
    assert "b-1" not in eng.table.committed_batches()
    assert "b-0" in eng.table.committed_batches()

    # corrected batch under the SAME id applies (not skipped) and reconverges
    m = eng.apply_batch(good_tail, "b-1")
    assert not m.get("skipped")
    assert key(eng.state()) == want_full
    # while the untouched head batch remains exactly-once
    assert eng.apply_batch(good_head, "b-0").get("skipped")

    # retention then retires the bad lineage
    eng.table.expire_snapshots(keep_last=1)
    assert [s["version"] for s in eng.table.snapshots()] == [4]
    assert key(eng.state()) == want_full


def test_rollback_refuses_vacuumed_target(spark, tmp_path):
    """rollback() onto a snapshot whose data dirs were vacuumed must fail
    up front with a clear error, not leave a head that errors mid-scan."""
    import pytest

    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.replay(synth_changelog(spark, 500, seed=3), n_batches=2)
    eng.table.compact()  # v3 references only its own rewrite
    eng.table.vacuum()   # v1/v2 data dirs gone, metas remain
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        eng.table.rollback(1)
    # and the head is still perfectly readable
    assert eng.state().count() > 0
