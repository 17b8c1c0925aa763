"""Round-5 closing batch: bootstrap handoff, churn stats, length quantiles,
vocabulary growth, n-gram novelty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    InsertMode,
    SinkConfig,
)
from kafka_connect_tablestore_spark.functions.text import (
    length_quantiles,
    vocab_growth,
)
from kafka_connect_tablestore_spark.operators.changefeed import (
    bootstrap_handoff,
    log_asof_prefix,
)
from kafka_connect_tablestore_spark.operators.dedup import ngram_novelty
from kafka_connect_tablestore_spark.operators.monitor import churn_stats
from kafka_connect_tablestore_spark.operators.rowchange import (
    split_errant,
    validate_and_classify,
)
from kafka_connect_tablestore_spark.plans.merge import merge_into_state
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

CFG = SinkConfig(insert_mode=InsertMode.PUT, delete_mode=DeleteMode.ROW)
ATTRS = ("commit", "lang", "content")

LOG_SCHEMA = (
    "topic string, partition int, offset long, commit_ts long, op string, "
    "repo string, path string, commit string, lang string, content string"
)


def _full_fold(log):
    clean, _ = split_errant(validate_and_classify(log, CFG, ATTRS))
    return merge_into_state(None, clean, CFG, ATTRS)


def _sorted_rows(df):
    return sorted(
        (tuple(r) for r in df.select("repo", "path", *ATTRS).collect())
    )


# --------------------------------------------------------------------------
# bootstrap_handoff
# --------------------------------------------------------------------------

def test_asof_suffix_complements_prefix(spark):
    log = synth_changelog(spark, 500, seed=7)
    n = log.count()
    pre = log_asof_prefix(log, fraction=0.5, keep="prefix").count()
    suf = log_asof_prefix(log, fraction=0.5, keep="suffix").count()
    assert pre + suf == n
    assert pre > 0 and suf > 0
    with pytest.raises(ValueError):
        log_asof_prefix(log, keep="middle")


def test_bootstrap_handoff_equals_full_fold_synth(spark):
    log = synth_changelog(spark, 2000, seed=11)
    got = bootstrap_handoff(log, CFG, ATTRS, fraction=0.5, redeliver_every=3)
    assert _sorted_rows(got) == _sorted_rows(_full_fold(log))


def test_bootstrap_handoff_no_redelivery_still_exact(spark):
    log = synth_changelog(spark, 1000, seed=13)
    got = bootstrap_handoff(log, CFG, ATTRS, fraction=0.3, redeliver_every=None)
    assert _sorted_rows(got) == _sorted_rows(_full_fold(log))


def test_bootstrap_handoff_update_after_delete_needs_tombstone(spark):
    """The adversarial cutover: key deleted late in the prefix, an OLDER
    partial UPDATE of the same key redelivered into the tail.  Only the
    retained tombstone's virtual DELETE outranks the stale UPDATE; a
    snapshot that dropped deleted rows would resurrect the key."""
    rows = [
        # key (r, p): PUT at t=10, partial UPDATE at t=20, DELETE at t=30.
        ("t", 0, 0, 10, "PUT", "r", "p", "c0", "py", "v0"),
        ("t", 0, 3, 20, "UPDATE", "r", "p", None, None, "v1"),
        ("t", 0, 6, 30, "DELETE", "r", "p", None, None, None),
        # a second live key so the result is non-empty.
        ("t", 0, 9, 40, "PUT", "r2", "p2", "c2", "go", "v2"),
        # tail-side event for r2 (after the midpoint bound).
        ("t", 0, 12, 95, "UPDATE", "r2", "p2", None, None, "v3"),
    ]
    log = spark.createDataFrame(rows, LOG_SCHEMA)
    # fraction=0.5 → bound ts=52: prefix holds offsets 0..9, tail holds 12.
    # redeliver_every=3 redelivers offsets 0, 3, 6, 9 — including the stale
    # UPDATE (offset 3) AFTER its DELETE already folded into the snapshot.
    got = bootstrap_handoff(log, CFG, ATTRS, fraction=0.5, redeliver_every=3)
    assert _sorted_rows(got) == _sorted_rows(_full_fold(log))
    assert _sorted_rows(got) == [("r2", "p2", "c2", "go", "v3")]


# --------------------------------------------------------------------------
# churn_stats
# --------------------------------------------------------------------------

def test_churn_stats_counts(spark):
    rows = [
        ("t", 0, 0, 10, "PUT", "a", "p1", "c", "py", "x"),
        ("t", 1, 1, 20, "UPDATE", "a", "p2", None, None, "y"),
        ("t", 0, 2, 30, "DELETE", "a", "p1", None, None, None),
        ("t", 0, 3, 40, "PUT", "b", "p1", "c", "go", "z"),
    ]
    log = spark.createDataFrame(rows, LOG_SCHEMA)
    got = {r["repo"]: r.asDict() for r in churn_stats(log).collect()}
    a = got["a"]
    assert (a["n_events"], a["n_puts"], a["n_updates"], a["n_deletes"]) == (3, 1, 1, 1)
    assert (a["n_paths"], a["n_partitions"]) == (2, 2)
    assert (a["first_ts"], a["last_ts"]) == (10, 30)
    b = got["b"]
    assert (b["n_events"], b["n_puts"], b["n_paths"], b["n_partitions"]) == (1, 1, 1, 1)


def test_churn_stats_totals_match_log(spark):
    log = synth_changelog(spark, 1000, seed=3)
    got = churn_stats(log)
    tot = got.agg(F.sum("n_events"), F.sum("n_puts"), F.sum("n_updates"), F.sum("n_deletes")).first()
    assert tot[0] == 1000 and tot[1] + tot[2] + tot[3] == 1000


# --------------------------------------------------------------------------
# length_quantiles
# --------------------------------------------------------------------------

def test_length_quantiles_exact_matches_numpy(spark):
    import numpy as np

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([("en", v) for v in vals], "lang string, n long")
    got = length_quantiles(df, ("n",), by="lang", probs=(0.25, 0.5, 0.75, 0.95)).first()
    assert got["n_docs"] == len(vals)
    for p in (25, 50, 75, 95):
        want = round(float(np.percentile(vals, p, method="linear")), 4)
        assert got[f"n_p{p:02d}"] == pytest.approx(want), p


def test_length_quantiles_approx_path_close(spark):
    df = spark.range(0, 1000).select(
        F.lit("en").alias("lang"), F.col("id").alias("n")
    )
    exact = length_quantiles(df, ("n",), by="lang", probs=(0.5,), exact=True).first()
    approx = length_quantiles(df, ("n",), by="lang", probs=(0.5,), exact=False).first()
    assert abs(exact["n_p50"] - approx["n_p50"]) <= 5


# --------------------------------------------------------------------------
# vocab_growth
# --------------------------------------------------------------------------

def test_vocab_growth_known_corpus(spark):
    docs = [
        (1, "a b c"),        # vocab {a,b,c}
        (2, "a b d"),        # + d
        (3, "a a a"),        # no new words
        (4, "e"),            # + e
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["cp"]: r.asDict()
        for r in vocab_growth(df, checkpoints=(1, 2, 3, 4)).collect()
    }
    assert (got[1]["n_docs"], got[1]["n_tokens"], got[1]["vocab_size"]) == (1, 3, 3)
    assert (got[2]["n_docs"], got[2]["n_tokens"], got[2]["vocab_size"]) == (2, 6, 4)
    assert (got[3]["n_docs"], got[3]["n_tokens"], got[3]["vocab_size"]) == (3, 9, 4)
    assert (got[4]["n_docs"], got[4]["n_tokens"], got[4]["vocab_size"]) == (4, 10, 5)


def test_vocab_growth_monotone_on_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        (r["cp"], r["n_docs"], r["n_tokens"], r["vocab_size"])
        for r in vocab_growth(docs, checkpoints=(10, 20, 40)).collect()
    )
    for a, b in zip(rows, rows[1:]):
        assert b[1] >= a[1] and b[2] >= a[2] and b[3] >= a[3]


# --------------------------------------------------------------------------
# ngram_novelty
# --------------------------------------------------------------------------

def test_ngram_novelty_known_corpus(spark):
    docs = [
        (1, "a b c d"),          # grams {abc, bcd} — both novel
        (2, "a b c d"),          # exact copy — zero novel
        (3, "a b c x y z"),      # grams {abc, bcx, cxy, xyz}: 3 novel
        (4, "q"),                # too short: 0 grams
        (5, None),               # null text: 0 grams
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_novel"]) for r in ngram_novelty(df).collect()}
    assert got[1] == (2, 2)
    assert got[2] == (2, 0)
    assert got[3] == (4, 3)
    assert got[4] == (0, 0)
    assert got[5] == (0, 0)
    with pytest.raises(ValueError):
        ngram_novelty(df, k=0)


def test_ngram_novelty_intra_doc_repeat_counts_once(spark):
    docs = [(1, "a b c a b c")]  # gram 'a b c' appears twice in one doc
    df = spark.createDataFrame(docs, "doc_id long, text string")
    r = ngram_novelty(df).first()
    # distinct grams: {a b c, b c a, c a b, a b c(dup)} → 3 distinct, all novel
    assert (r["n_grams"], r["n_novel"]) == (3, 3)


# --------------------------------------------------------------------------
# CdcEngine.bootstrap (engine-level snapshot-then-stream cutover)
# --------------------------------------------------------------------------

def test_engine_bootstrap_then_tail_replay(spark, tmp_path):
    from kafka_connect_tablestore_spark.engine import CdcEngine

    log = synth_changelog(spark, 2000, seed=17)
    prefix = log_asof_prefix(log, fraction=0.5)
    tail = log_asof_prefix(log, fraction=0.5, keep="suffix")
    snap = _full_fold(prefix)  # plain state: pk + attrs, no meta

    eng = CdcEngine(spark, CFG, str(tmp_path / "lake"))
    eng.bootstrap(snap)
    assert eng.state().count() == snap.count()
    eng.replay(tail, n_batches=3)

    full = CdcEngine(spark, CFG, str(tmp_path / "lake_full"))
    full.replay(log, n_batches=3)

    cols = ["repo", "path", *ATTRS]
    got = sorted(tuple(r) for r in eng.state().select(*cols).collect())
    want = sorted(tuple(r) for r in full.state().select(*cols).collect())
    assert got == want


def test_engine_bootstrap_is_exactly_once(spark, tmp_path):
    from kafka_connect_tablestore_spark.engine import CdcEngine

    log = synth_changelog(spark, 300, seed=19)
    snap = _full_fold(log_asof_prefix(log, fraction=0.5))
    eng = CdcEngine(spark, CFG, str(tmp_path / "lake"))
    eng.bootstrap(snap)
    again = eng.bootstrap(snap)  # same batch_id → committed-batch skip
    assert again.get("skipped")
    cols = ["repo", "path", *ATTRS]
    assert sorted(map(tuple, eng.state().select(*cols).collect())) == \
        sorted(map(tuple, snap.select(*cols).collect()))


# --------------------------------------------------------------------------
# lineage view
# --------------------------------------------------------------------------

def test_lineage_frame_covers_replay(spark, tmp_path):
    from kafka_connect_tablestore_spark.engine import CdcEngine

    log = synth_changelog(spark, 900, seed=23)
    cfg = SinkConfig(
        insert_mode=InsertMode.PUT,
        delete_mode=DeleteMode.ROW,
        lineage_per_partition=True,
    )
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.replay(log, n_batches=3)
    lin = eng.lineage()
    rows = lin.collect()
    assert {r["batch_id"] for r in rows} == {"replay-0", "replay-1", "replay-2"}
    # per-partition lineage: rows sum to the clean event count, offsets
    # nest inside each batch's slice
    assert sum(r["rows"] for r in rows) == 900
    for r in rows:
        assert r["start_offset"] <= r["end_offset"]
        assert r["errant_rows"] == 0
        assert r["committed_at_version"] >= 1


def test_lineage_frame_observed_mode(spark, tmp_path):
    from kafka_connect_tablestore_spark.engine import CdcEngine

    log = synth_changelog(spark, 400, seed=29)
    eng = CdcEngine(spark, CFG, str(tmp_path / "lake"))  # observed default
    eng.replay(log, n_batches=2)
    rows = eng.lineage().collect()
    assert {r["partition"] for r in rows} == {"_global"}
    assert sum(r["rows"] for r in rows) == 400
