"""Round-5 closing-batch-3 operator: the cross-split near-dup leakage
audit (split_leakage) and the split_assign expression it exposes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.corpus import (
    hash_split,
    split_assign,
    split_leakage,
)

W = {"train": 0.9, "val": 0.05, "test": 0.05}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_assign_matches_hash_split(spark):
    d = spark.range(300).select(F.col("id").alias("doc_id"))
    via_frame = {r["doc_id"]: r["split"] for r in hash_split(d, W).collect()}
    via_expr = {
        r["doc_id"]: r["s"]
        for r in d.select("doc_id", split_assign(F.col("doc_id"), W).alias("s")).collect()
    }
    assert via_frame == via_expr


def test_split_leakage_reports_only_cross_split_neardups(spark):
    # A shared near-identical passage stamped onto many ids guarantees the
    # LSH pairs; which pairs LEAK depends only on the ids' split labels,
    # which we recompute here the same way the operator does.
    base = "the quick brown fox jumps over the lazy dog again and again today"
    ids = list(range(40))
    rows = [(i, base + f" tail{i % 2}") for i in ids]
    # plus docs with unrelated text: never candidates
    rows += [(1000 + i, f"completely different words number {i} " * 5) for i in range(5)]
    d = _docs(spark, rows)
    out = split_leakage(d, W, min_match=6).collect()
    labels = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.select("doc_id"), W).collect()
    }
    for r in out:
        # every reported pair straddles a boundary and carries the true labels
        assert r["split_a"] == labels[r["doc_a"]]
        assert r["split_b"] == labels[r["doc_b"]]
        assert r["split_a"] != r["split_b"]
        assert r["n_match"] >= 6
        assert r["doc_a"] < r["doc_b"]
    # with 40 near-identical docs at 90/5/5 weights, at least one pair
    # must straddle unless the hash put ALL 40 in one split (p < 1e-4 —
    # and deterministic here: assert it concretely so the test is stable)
    assert len({labels[i] for i in ids}) > 1
    assert len(out) > 0
    # exactness: the audit equals the manually-tagged candidate set
    from kafka_connect_tablestore_spark.operators.dedup import minhash_lsh_pairs

    expected = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(d).where("n_match >= 6").collect()
        if labels[r["doc_a"]] != labels[r["doc_b"]]
    }
    assert {(r["doc_a"], r["doc_b"]) for r in out} == expected


def test_split_leakage_empty_when_one_label(spark):
    rows = [(i, "same text repeated for everyone in this tiny corpus ok") for i in range(10)]
    d = _docs(spark, rows)
    out = split_leakage(d, {"all": 1.0}, min_match=1)
    assert out.count() == 0


def test_split_leakage_validates_weights(spark):
    d = _docs(spark, [(1, "a b c d e")])
    with pytest.raises(ValueError):
        split_leakage(d, {"a": 0.7, "b": 0.7}).count()


def test_hash_split_rejects_sub_grid_weight(spark):
    d = spark.range(10).select(F.col("id").alias("doc_id"))
    # 0.00002 rounds to a zero-width band on the 1/10000 hash grid: the
    # split would silently receive no rows — must raise instead
    with pytest.raises(ValueError, match="empty band"):
        hash_split(d, {"train": 0.99996, "val": 0.00002, "test": 0.00002})
    # a representable tiny split still works
    out = hash_split(d, {"train": 0.9998, "val": 0.0001, "test": 0.0001})
    assert out.count() == 10


def test_bootstrap_handoff_computes_bounds_once(spark):
    """The corpus-time bound must be materialized once and shared: the
    executed plan of the handoff result contains NO min/max bounds
    aggregate (it ran eagerly at construction), where the naive form
    plans one per branch (measured: three)."""
    from kafka_connect_tablestore_spark import DeleteMode, SinkConfig
    from kafka_connect_tablestore_spark.operators.changefeed import (
        bootstrap_handoff,
    )
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog

    log = synth_changelog(spark, 2000, seed=7, n_repos=10)
    out = bootstrap_handoff(log, SinkConfig(delete_mode=DeleteMode.ROW))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "min(commit_ts" not in plan and "_ts_min" not in plan
    assert out.count() > 0
