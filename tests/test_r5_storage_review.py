"""Storage-layer review hardening (round-5 final review of lake/table.py).

Covers the nine adjudicated findings: mixed-version parquet reads via the
snapshot schema (not footer inference), type-normalized PK hashing, whitelist
narrowing refusal, the evolved-schema column cap, compare-and-swap commits,
typed empty reads, numeric snapshot ordering past v999999, and GC path
boundaries.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.lake.table import (
    ConcurrentCommitError,
    LakeTable,
    TableValidationError,
)


def _events(spark, rows, ddl):
    """Clean-event frame: (partition, offset, commit_ts, op) + caller cols."""
    return spark.createDataFrame(rows, ddl)


def _two_bucket_keys(spark, cfg):
    """Two repo keys guaranteed to hash to different buckets."""
    from kafka_connect_tablestore_spark.functions.hashing import bucket_of

    cand = [(f"repo-{i}", "f.py") for i in range(20)]
    df = spark.createDataFrame(cand, "repo string, path string").withColumn(
        "b", bucket_of(cfg.pk_fields, cfg.n_buckets)
    )
    rows = df.collect()
    first = rows[0]
    other = next(r for r in rows if r["b"] != first["b"])
    return (first["repo"], first["path"]), (other["repo"], other["path"])


# --------------------------------------------------------------------- #1
def test_added_column_survives_mixed_version_read(spark, tmp_path):
    """A column ADDed after some buckets were written must read with its
    real values (new buckets) and typed NULLs (carried-forward buckets) —
    not be nulled table-wide by an unlucky footer pick."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    (r1, p1), (r2, p2) = _two_bucket_keys(spark, cfg)
    t = LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=("commit", "stars"))
    ddl1 = "partition int, offset long, commit_ts long, op string, repo string, path string, commit string"
    t.merge_batch(_events(spark, [(0, 0, 1, "PUT", r1, p1, "c1")], ddl1), "b-0")
    ddl2 = ddl1 + ", stars long"
    t.merge_batch(
        _events(spark, [(0, 1, 2, "PUT", r2, p2, "c2", 7)], ddl2), "b-1"
    )
    got = {(r["repo"], r["path"]): r["stars"] for r in t.read().collect()}
    assert got[(r2, p2)] == 7  # the added column's data is intact
    assert got[(r1, p1)] is None  # pre-ADD bucket reads as typed NULL


def test_widened_column_survives_mixed_version_read(spark, tmp_path):
    """int→long widening with old-int buckets carried forward: the read
    spans both physical types and must return the widened type."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    (r1, p1), (r2, p2) = _two_bucket_keys(spark, cfg)
    t = LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=("stars",))
    base = "partition int, offset long, commit_ts long, op string, repo string, path string"
    t.merge_batch(_events(spark, [(0, 0, 1, "PUT", r1, p1, 3)], base + ", stars int"), "b-0")
    t.merge_batch(_events(spark, [(0, 1, 2, "PUT", r2, p2, 9)], base + ", stars long"), "b-1")
    out = t.read()
    assert dict(out.dtypes)["stars"] == "bigint"
    got = {(r["repo"], r["path"]): r["stars"] for r in out.collect()}
    assert got == {(r1, p1): 3, (r2, p2): 9}


# --------------------------------------------------------------------- #2
def test_narrow_typed_pk_events_land_in_snapshot_buckets(spark, tmp_path):
    """Events whose PK arrives int against a long-typed table must hash in
    the stored type: every written row stays referenced by the bucket map."""
    cfg = SinkConfig(
        pk_fields=("id", "path"), pk_types=("long", "string"), delete_mode=DeleteMode.ROW
    )
    t = LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=("commit",))
    base = "partition int, offset long, commit_ts long, op string"
    t.merge_batch(
        _events(
            spark,
            [(0, i, 1, "PUT", i, "f.py", "c1") for i in range(40)],
            base + ", id long, path string, commit string",
        ),
        "b-long",
    )
    # second batch arrives with id typed INT (narrower than the table)
    t.merge_batch(
        _events(
            spark,
            [(0, 100 + i, 2, "PUT", i, "f.py", "c2") for i in range(40)],
            base + ", id int, path string, commit string",
        ),
        "b-int",
    )
    out = t.read()
    assert out.count() == 40  # no rows fell out of the bucket map
    assert set(r["commit"] for r in out.collect()) == {"c2"}  # all updated


def test_uncastable_pk_is_dead_lettered_not_fatal(spark, tmp_path):
    """A PK value that can't cast to the declared type becomes NULL and is
    dead-lettered by the NULL_PRIMARY_KEY gate (not an ANSI job failure)."""
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog

    cfg = SinkConfig(
        pk_fields=("repo", "path"), pk_types=("long", "string"), delete_mode=DeleteMode.NONE
    )
    events = synth_changelog(spark, 50, seed=3)  # repo is a string name
    eng = CdcEngine(spark, cfg, str(tmp_path))
    m = eng.apply_batch(events, "b-0")
    errant = sum(p.get("errant_rows", 0) for p in m["partitions"].values())
    assert errant == 50 and eng.state().count() == 0


# --------------------------------------------------------------------- #3
def test_whitelist_narrowing_on_existing_table_refused(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=("commit", "lang"))
    ddl = "partition int, offset long, commit_ts long, op string, repo string, path string, commit string, lang string"
    t.merge_batch(_events(spark, [(0, 0, 1, "PUT", "r", "p", "c", "py")], ddl), "b-0")
    cfg2 = SinkConfig(delete_mode=DeleteMode.ROW, column_whitelist=("lang",))
    with pytest.raises(TableValidationError, match="whitelist excludes stored"):
        LakeTable(spark, str(tmp_path), "t", cfg2, attr_fields=("commit", "lang"))


# --------------------------------------------------------------------- #4
def test_evolution_past_column_cap_rejected_before_commit(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    attrs = tuple(f"a{i:03d}" for i in range(129))
    t = LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=attrs)
    ddl = (
        "partition int, offset long, commit_ts long, op string, "
        "repo string, path string, " + ", ".join(f"{a} string" for a in attrs)
    )
    row = (0, 0, 1, "PUT", "r", "p") + tuple("x" for _ in attrs)
    with pytest.raises(TableValidationError, match="exceed 128"):
        t.merge_batch(_events(spark, [row], ddl), "b-0")
    # nothing was committed past the cap: the table is still openable
    assert t.snapshot()["version"] == 0 and t.snapshot()["schema"] == {}
    LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=attrs[:5])


# --------------------------------------------------------------------- #5
def test_commit_is_compare_and_swap(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg)
    t.create_if_absent()
    v = t.current_version()
    meta = {**t.snapshot(), "version": v + 1, "parent": v}
    t._commit(meta)
    with pytest.raises(ConcurrentCommitError):
        t._commit({**meta, "buckets": {"0": ["clobber"]}})
    # the winner's snapshot is intact
    assert t.snapshot()["buckets"] == meta["buckets"]


def test_meta_creation_is_the_commit_point(spark, tmp_path):
    """A crash after the meta file lands but before the pointer update must
    still count as committed: the listing, not the pointer, is truth."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg)
    t.create_if_absent()
    v = t.current_version()
    crashed = {**t.snapshot(), "version": v + 1, "parent": v}
    with open(t._meta_path(v + 1), "w") as f:  # meta only — no pointer
        json.dump(crashed, f)
    assert t.current_version() == v + 1


# ----------------------------------------------------------------- #6 / #7
def test_compact_empty_table_is_a_noop(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg)
    t.create_if_absent()
    res = t.compact(tombstone_watermark_ts=123)
    assert res["n_buckets"] == 0 and t.read().count() == 0


def test_empty_read_has_configured_pk_types(spark, tmp_path):
    cfg = SinkConfig(pk_fields=("id",), pk_types=("long",), delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg, attr_fields=("commit",))
    t.create_if_absent(schema={"commit": "string"})
    empty = t.read()
    assert dict(empty.dtypes)["id"] == "bigint"
    t.merge_batch(
        _events(
            spark,
            [(0, 0, 1, "PUT", 1, "c")],
            "partition int, offset long, commit_ts long, op string, id long, commit string",
        ),
        "b-0",
    )
    assert dict(t.read().dtypes) == dict(empty.dtypes)  # empty == non-empty schema
    assert dict(t.read(include_meta=True).dtypes)["_deleted"] == "boolean"


# --------------------------------------------------------------------- #8
def test_snapshot_ordering_is_numeric_past_six_digits(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg)
    t.create_if_absent()
    base = t.snapshot()
    for v in (999999, 1000000):
        with open(t._meta_path(v), "w") as f:
            json.dump({**base, "version": v}, f)
    assert [s["version"] for s in t.snapshots()] == [0, 999999, 1000000]
    assert t.current_version() == 1000000


def test_gc_prefix_match_respects_path_boundaries(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    t = LakeTable(spark, str(tmp_path), "t", cfg)
    t.create_if_absent()
    data = os.path.join(t.dir, "data")
    os.makedirs(os.path.join(data, "snap100000"))
    os.makedirs(os.path.join(data, "snap1000000", "_bucket=0"))
    live = {os.path.join(data, "snap1000000", "_bucket=0")}
    removed = t._gc_data_dirs(live)
    assert os.path.join(data, "snap100000") in removed
    assert os.path.isdir(os.path.join(data, "snap1000000", "_bucket=0"))
