"""The PUT/UPDATE × delete-mode × null-shape semantic matrix, ported 1:1 from
``RowChangeTransformerTest.java:106-762`` (SURVEY §5 — "the correctness
contract").  Each case runs a tiny change log through classify → fold → state
and asserts the reference's expected outcome (RowPutChange / RowUpdateChange /
RowDeleteChange / TransformException equivalents)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_tablestore_spark.config import DeleteMode, InsertMode, SinkConfig
from kafka_connect_tablestore_spark.operators.rowchange import (
    split_errant,
    validate_and_classify,
)
from kafka_connect_tablestore_spark.plans.merge import merge_into_state

ATTRS = ("commit", "lang", "content")

SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def ev(offset, op, commit=None, lang=None, content=None, repo="r", path="p"):
    return ("t", 0, offset, 1000 + offset, op, repo, path, commit, lang, content)


def apply(spark, events, config, target_rows=None):
    df = spark.createDataFrame(events, SCHEMA)
    classified = validate_and_classify(df, config, ATTRS)
    clean, errant = split_errant(classified)
    target = None
    if target_rows:
        target = spark.createDataFrame(
            target_rows, "repo string, path string, commit string, lang string, content string"
        )
    state = merge_into_state(target, clean, config, ATTRS)
    return (
        {(r["repo"], r["path"]): r.asDict() for r in state.collect()},
        [r["error_info"] for r in errant.collect()],
    )


def cfg(insert, delete):
    return SinkConfig(insert_mode=insert, delete_mode=delete)


P, U = InsertMode.PUT, InsertMode.UPDATE
NONE, COL, ROW, BOTH = (
    DeleteMode.NONE, DeleteMode.COLUMN, DeleteMode.ROW, DeleteMode.ROW_AND_COLUMN
)

TOMB = [ev(0, "DELETE")]  # value == null (tombstone)


# --- null value (writeNullValueWith*) — RowChangeTransformerTest.java:104-256
@pytest.mark.parametrize("im,dm,outcome", [
    (P, NONE, "empty_row"),   # :104-123  RowPutChange (覆盖写)
    (P, COL, "empty_row"),    # :127-146  RowPutChange
    (P, ROW, "deleted"),      # :151-170  RowDeleteChange
    (P, BOTH, "deleted"),     # :174-193  RowDeleteChange
    (U, NONE, "errant"),      # :198-216  TransformException
    (U, COL, "errant"),       # :221-240  TransformException
    (U, ROW, "deleted"),      # :245-263  RowDeleteChange
    (U, BOTH, "deleted"),     # :268-286  RowDeleteChange
])
def test_null_value_matrix(spark, im, dm, outcome):
    # seed an existing row so "deleted" is observable
    prior = [("r", "p", "c0", "py", "body0")]
    state, errs = apply(spark, TOMB, cfg(im, dm), target_rows=prior)
    if outcome == "deleted":
        assert ("r", "p") not in state and not errs
    elif outcome == "errant":
        assert errs == ["DELETE_NOT_ALLOWED"]
        assert state[("r", "p")]["content"] == "body0"  # untouched
    else:  # empty_row: full overwrite with no columns
        row = state[("r", "p")]
        assert all(row[c] is None for c in ATTRS) and not errs


# --- all fields null, value present (writeNullFieldsWith*) — :300-490
ALL_NULL_PUT = [ev(0, "PUT")]
ALL_NULL_UPD = [ev(0, "UPDATE")]


@pytest.mark.parametrize("dm", [NONE, COL, ROW, BOTH])
def test_all_null_fields_put_is_empty_overwrite(spark, dm):
    prior = [("r", "p", "c0", "py", "body0")]
    state, errs = apply(spark, ALL_NULL_PUT, cfg(P, dm), target_rows=prior)
    row = state[("r", "p")]
    assert all(row[c] is None for c in ATTRS) and not errs  # RowPutChange, no cols


@pytest.mark.parametrize("dm,outcome", [
    (NONE, "errant"),  # :400-416 TransformException
    (ROW, "errant"),   # :420-440 TransformException
    (COL, "cleared"),  # :445-464 RowUpdateChange DELETE_ALL
    (BOTH, "cleared"),  # :469-490 RowUpdateChange DELETE_ALL
])
def test_all_null_fields_update(spark, dm, outcome):
    prior = [("r", "p", "c0", "py", "body0")]
    state, errs = apply(spark, ALL_NULL_UPD, cfg(U, dm), target_rows=prior)
    if outcome == "errant":
        assert errs == ["ALL_COLUMNS_NULL"]
        assert state[("r", "p")]["content"] == "body0"
    else:
        row = state[("r", "p")]
        assert all(row[c] is None for c in ATTRS) and not errs


# --- partial null (writeNullFieldsWith*2 / partial) — :495-705
PARTIAL = [ev(0, "UPDATE", commit="c1", lang=None, content="body1")]


@pytest.mark.parametrize("dm", [NONE, COL, ROW, BOTH])
def test_partial_null_put_overwrites(spark, dm):
    prior = [("r", "p", "c0", "py", "body0")]
    state, errs = apply(spark, [ev(0, "PUT", commit="c1", content="body1")],
                        cfg(P, dm), target_rows=prior)
    row = state[("r", "p")]
    # PUT drops the absent column (InsertModeTest.java:79-136)
    assert row["commit"] == "c1" and row["lang"] is None and row["content"] == "body1"
    assert not errs


@pytest.mark.parametrize("dm,lang_after", [
    (NONE, "py"),   # null ignored → old value preserved (:611-648)
    (ROW, "py"),
    (COL, None),    # null deletes column (:667-705 DELETE_ALL marker)
    (BOTH, None),
])
def test_partial_null_update(spark, dm, lang_after):
    prior = [("r", "p", "c0", "py", "body0")]
    state, errs = apply(spark, PARTIAL, cfg(U, dm), target_rows=prior)
    row = state[("r", "p")]
    assert row["commit"] == "c1" and row["content"] == "body1"
    assert row["lang"] == lang_after and not errs


# --- update creates missing rows (Tablestore UpdateRow upsert) ------------
def test_update_on_missing_key_creates_row(spark):
    state, errs = apply(spark, PARTIAL, cfg(U, NONE))
    assert state[("r", "p")]["content"] == "body1" and not errs


# --- sequencing: delete then update resurrects only post-delete columns ---
def test_delete_then_update_resurrects(spark):
    events = [
        ev(0, "PUT", commit="c0", lang="py", content="b0"),
        ev(1, "DELETE"),
        ev(2, "UPDATE", commit="c2"),
    ]
    state, errs = apply(spark, events, cfg(U, ROW))
    row = state[("r", "p")]
    assert row["commit"] == "c2" and row["lang"] is None and row["content"] is None


def test_put_resets_columns_mid_stream(spark):
    events = [
        ev(0, "UPDATE", lang="py"),
        ev(1, "PUT", commit="c1", content="b1"),   # full overwrite: lang dropped
        ev(2, "UPDATE", content="b2"),
    ]
    state, errs = apply(spark, events, cfg(P, ROW))
    row = state[("r", "p")]
    assert row == {"repo": "r", "path": "p", "commit": "c1", "lang": None, "content": "b2"}


def test_null_pk_is_errant(spark):
    state, errs = apply(spark, [ev(0, "PUT", commit="c", repo=None)], cfg(P, ROW))
    assert errs == ["NULL_PRIMARY_KEY"] and not state
