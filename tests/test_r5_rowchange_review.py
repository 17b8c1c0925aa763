"""Row-change core review hardening (round-5 final review of
rowchange.py / merge.py / lww.py): unknown-op dead-lettering, record-level
tombstone detection under a column whitelist, and DLQ payload preservation
for errant downgraded DELETEs — engine and pure-Python oracle in lockstep.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, InsertMode, SinkConfig
from kafka_connect_tablestore_spark.operators.rowchange import (
    ERROR_COL,
    split_errant,
    validate_and_classify,
)
from kafka_connect_tablestore_spark.oracle import replay
from kafka_connect_tablestore_spark.plans.merge import merge_into_state

ATTRS = ("commit", "lang", "content")
DDL = (
    "topic string, partition int, offset long, commit_ts long, op string, "
    "repo string, path string, commit string, lang string, content string"
)


def _state(spark, rows, cfg):
    df = spark.createDataFrame(rows, DDL)
    clean, errant = split_errant(validate_and_classify(df, cfg, ATTRS))
    return merge_into_state(None, clean, cfg, ATTRS), errant


def test_unknown_op_is_dead_lettered_not_a_phantom_delete(spark):
    """A lowercase/mistyped op must reach the DLQ — previously it passed the
    gate as clean and acted as a row-delete barrier in the fold."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    rows = [
        ("t", 0, 0, 1, "PUT", "r", "p", "c1", "py", "x"),
        ("t", 0, 1, 2, "put", "r", "p", "c2", "py", "y"),  # malformed op
        ("t", 0, 2, 3, "INSERT", "r", "q", "c3", "go", "z"),  # unknown op
    ]
    state, errant = _state(spark, rows, cfg)
    errs = {(r["offset"], r[ERROR_COL]) for r in errant.collect()}
    assert errs == {(1, "UNKNOWN_OP"), (2, "UNKNOWN_OP")}
    got = {(r["repo"], r["path"]): r["commit"] for r in state.collect()}
    assert got == {("r", "p"): "c1"}  # the valid PUT survives untouched

    # oracle parity on the identical input
    events = [dict(zip(DDL.replace(" string", "").replace(" int", "").replace(" long", "").split(", "), r)) for r in rows]
    want_state, want_dlq = replay(events, cfg, ATTRS)
    assert len(want_dlq) == 2 and all(d["error_info"] == "UNKNOWN_OP" for d in want_dlq)
    assert {pk[:2] for pk in want_state} == {("r", "p")}


def test_null_op_in_op_carrying_log_is_dead_lettered(spark):
    """A null op in a log that carries an op column is malformed — it must
    not silently vanish from the fold."""
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    rows = [
        ("t", 0, 0, 1, "PUT", "r", "p", "c1", "py", "x"),
        ("t", 0, 1, 2, None, "r", "p", "c2", "py", "y"),
    ]
    state, errant = _state(spark, rows, cfg)
    assert [r[ERROR_COL] for r in errant.collect()] == ["UNKNOWN_OP"]
    assert state.count() == 1


def test_whitelist_does_not_turn_partial_records_into_tombstones(spark):
    """No-op-column log + whitelist: a record whose WHITELISTED columns are
    null but whose other columns carry data is value!=null in the reference
    — an overwrite with an empty projected payload, never a DELETE."""
    cfg = SinkConfig(
        insert_mode=InsertMode.PUT,
        delete_mode=DeleteMode.ROW,
        column_whitelist=("lang",),
    )
    ddl = DDL.replace("op string, ", "")
    rows = [
        ("t", 0, 0, 1, "r", "p", "c1", "py", "x"),
        # lang (whitelisted) null, commit/content non-null: NOT a tombstone
        ("t", 0, 1, 2, "r", "p", "c2", None, "y"),
        # true tombstone: every attribute null -> row delete
        ("t", 0, 2, 3, "r", "q", None, None, None),
        ("t", 0, 3, 4, "r", "q", "c4", "go", "z"),
        ("t", 0, 4, 5, "r", "q", None, None, None),
    ]
    df = spark.createDataFrame(rows, ddl)
    clean, errant = split_errant(validate_and_classify(df, cfg, ATTRS))
    state = merge_into_state(None, clean, cfg, ATTRS)
    assert errant.count() == 0
    got = {(r["repo"], r["path"]): r["lang"] for r in state.collect()}
    # (r,p) survives as an empty overwrite; (r,q) was truly tombstoned
    assert got == {("r", "p"): None}

    # oracle computes the same final state on the op-less event stream
    names = [f.split()[0] for f in ddl.split(", ")]
    events = [dict(zip(names, r)) for r in rows]
    want_state, want_dlq = replay(events, cfg, ATTRS)
    assert not want_dlq
    assert {pk[:2]: a.get("lang") for pk, a in want_state.items()} == {("r", "p"): None}


def test_errant_downgraded_delete_keeps_payload_for_dlq(spark):
    """insert=put + delete.mode=none: a DELETE with a null PK is errant —
    its original payload must survive to the DLQ, not be nulled by the
    empty-overwrite downgrade that only applies to clean rows."""
    cfg = SinkConfig(
        insert_mode=InsertMode.PUT,
        delete_mode=DeleteMode.NONE,
    )
    rows = [("t", 0, 0, 1, "DELETE", None, "p", "c1", "go", "evidence")]
    df = spark.createDataFrame(rows, DDL)
    classified = validate_and_classify(df, cfg, ATTRS)
    _, errant = split_errant(classified)
    r = errant.collect()[0]
    assert r[ERROR_COL] == "NULL_PRIMARY_KEY"
    assert (r["commit"], r["lang"], r["content"]) == ("c1", "go", "evidence")
    # a clean downgraded DELETE still presents the columnless payload
    clean_rows = [("t", 0, 1, 2, "DELETE", "r", "p", "c2", "py", "x")]
    clean, _ = split_errant(
        validate_and_classify(spark.createDataFrame(clean_rows, DDL), cfg, ATTRS)
    )
    c = clean.collect()[0]
    assert (c["commit"], c["lang"], c["content"]) == (None, None, None)
    assert c["op"] == "PUT"
