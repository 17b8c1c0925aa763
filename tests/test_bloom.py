"""Bloom-gated cross-corpus dedup (Bloom 1970; the Dolma-style crawl gate).

The contract under test: the gate is ONE-SIDED (no false negatives ever —
a doc whose content exists in the prior corpus is always flagged), false
positives appear when the bitset is undersized, and ``verify=True``'s
exact confirmation join makes the composed verdict equal
``cross_dedup_exact`` bit-for-bit while probing only the flagged subset."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.dedup import (
    bloom_dedup,
    build_bloom_bitset,
    cross_dedup_exact,
)


def _split(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 400")
    )
    new, prior = d.where("doc_id % 2 = 1"), d.where("doc_id % 2 = 0")
    # inject genuine cross-corpus duplicates: 10 new docs repeat prior content
    dup = prior.where("doc_id < 20").selectExpr(
        "doc_id + 10001 AS doc_id", "text"
    )
    return new.unionByName(dup), prior


def test_bloom_has_no_false_negatives(spark):
    new, prior = _split(spark)
    exact = cross_dedup_exact(new, prior)
    for m_bits in (256, 4096, 1 << 16):  # even a saturated tiny filter
        v = bloom_dedup(new, prior, m_bits=m_bits, k=3)
        fn = (
            v.join(exact, ["doc_id", "fp"])
            .where("in_prior AND NOT maybe_in_prior")
            .count()
        )
        assert fn == 0, f"false negative at m_bits={m_bits}"


def test_tiny_bitset_false_positives_and_verified_equality(spark):
    new, prior = _split(spark)
    exact = cross_dedup_exact(new, prior)
    raw = bloom_dedup(new, prior, m_bits=256, k=2)
    fp_count = (
        raw.join(exact, ["doc_id", "fp"])
        .where("maybe_in_prior AND NOT in_prior")
        .count()
    )
    assert fp_count > 0  # 200 distinct fps into 256 bits must collide
    got = {
        (r["doc_id"], r["fp"], r["in_prior"])
        for r in bloom_dedup(new, prior, m_bits=256, k=2, verify=True).collect()
    }
    want = {(r["doc_id"], r["fp"], r["in_prior"]) for r in exact.collect()}
    assert got == want
    # the injected duplicates really are flagged true
    assert sum(1 for _, __, hit in got if hit) >= 10


def test_roomy_bitset_is_nearly_exact(spark):
    new, prior = _split(spark)
    exact = cross_dedup_exact(new, prior)
    v = bloom_dedup(new, prior, m_bits=1 << 16, k=3)
    j = v.join(exact, ["doc_id", "fp"])
    assert j.where("maybe_in_prior AND NOT in_prior").count() == 0
    assert j.where("in_prior AND NOT maybe_in_prior").count() == 0


def test_bitset_bounded_and_reusable(spark):
    new, prior = _split(spark)
    bs = build_bloom_bitset(prior, m_bits=4096, k=3)
    assert bs.count() <= 4096 // 64
    assert bs.columns == ["word_idx", "word"]
    # a pre-built bitset gives the same verdict as the inline build
    a = {
        (r["doc_id"], r["maybe_in_prior"])
        for r in bloom_dedup(new, bitset=bs, m_bits=4096, k=3).collect()
    }
    b = {
        (r["doc_id"], r["maybe_in_prior"])
        for r in bloom_dedup(new, prior, m_bits=4096, k=3).collect()
    }
    assert a == b


def test_bloom_validation(spark):
    new, prior = _split(spark)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_dedup(new, prior, m_bits=100, k=2)
    with pytest.raises(ValueError, match="k must be"):
        bloom_dedup(new, prior, m_bits=256, k=0)
    with pytest.raises(ValueError, match="prior= or bitset="):
        bloom_dedup(new, m_bits=256, k=2)
    with pytest.raises(ValueError, match="verify=True needs"):
        bs = build_bloom_bitset(prior, m_bits=256, k=2)
        bloom_dedup(new, bitset=bs, m_bits=256, k=2, verify=True)


def test_bloom_probe_plan_broadcasts_bitset(spark):
    """The at-scale contract: the crawl side never shuffles for the gate —
    the bitset is broadcast into the probe join, and the only exchange in
    the raw-verdict plan is the per-doc verdict aggregate."""
    new, prior = _split(spark)
    bs = build_bloom_bitset(prior, m_bits=4096, k=3)
    plan = (
        bloom_dedup(new, bitset=bs, m_bits=4096, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_incremental_bloom_three_cycles_equal_recompute(spark, tmp_path):
    """Probe-then-append across three daily batches must equal the two-frame
    recompute at every step (bitset OR is associative), and compaction must
    not change any verdict while shrinking the index to <= m/64 rows."""
    from kafka_connect_tablestore_spark.operators.dedup import (
        append_to_bloom_index,
        build_bloom_index,
        compact_bloom_index,
        incremental_bloom_dedup,
    )

    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 300")
    )
    dup = d.where("doc_id < 10").selectExpr("doc_id + 5000 AS doc_id", "text")
    days = [
        d.where("doc_id < 100"),
        d.where("doc_id >= 100 and doc_id < 200"),
        d.where("doc_id >= 200").unionByName(dup),  # repeats day-0 content
    ]
    idx = str(tmp_path / "bloom_idx")
    build_bloom_index(days[0], idx, m_bits=4096, k=3)
    prior = days[0]
    last = None
    for day in days[1:]:
        verdicts, bits = incremental_bloom_dedup(spark, idx, day)
        want = {
            (r["doc_id"], r["maybe_in_prior"])
            for r in bloom_dedup(day, prior, m_bits=4096, k=3).collect()
        }
        got = {(r["doc_id"], r["maybe_in_prior"]) for r in verdicts.collect()}
        assert got == want
        append_to_bloom_index(bits, idx)
        prior = prior.unionByName(day)
        last = (day, want)
    # the cross-day duplicates were flagged
    day3_flags = dict(last[1])
    assert all(day3_flags[5000 + i] for i in range(10))
    # compaction: verdicts identical, index at the single-row-per-word bound
    # (probe the same day before and after — day-3's own bits are now in the
    # index, so it self-flags; compaction must not change that verdict)
    pre, _ = incremental_bloom_dedup(spark, idx, last[0])
    pre_set = {(r["doc_id"], r["maybe_in_prior"]) for r in pre.collect()}
    compact_bloom_index(spark, idx)
    assert spark.read.parquet(idx).count() <= 4096 // 64
    v2, _ = incremental_bloom_dedup(spark, idx, last[0])
    assert {(r["doc_id"], r["maybe_in_prior"]) for r in v2.collect()} == pre_set


def test_bloom_index_meta_mismatch_raises(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.dedup import (
        build_bloom_index,
        incremental_bloom_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    idx = str(tmp_path / "bloom_idx")
    build_bloom_index(docs, idx, m_bits=256, k=2)
    # params come from the sidecar, not the caller — same verdict either way
    v, _ = incremental_bloom_dedup(spark, idx, docs)
    assert v.where("NOT maybe_in_prior").count() == 0  # all content indexed


def test_lsh_parameter_plan_known_values(spark):
    """128 hashes at threshold 0.8: the planner must reproduce the
    hand-computed s-curve table and flag (bands=8, rows=16) as argmin."""
    from kafka_connect_tablestore_spark.operators.dedup import (
        lsh_parameter_plan,
    )

    plan = {
        r["bands"]: r
        for r in lsh_parameter_plan(spark, n_hashes=128, threshold=0.8).collect()
    }
    assert set(plan) == {1, 2, 4, 8, 16, 32, 64, 128}
    assert all(r["rows_per_band"] == 128 // b for b, r in plan.items())
    best = plan[8]
    assert best["is_best"] and best["rows_per_band"] == 16
    assert best["p_at_threshold"] == pytest.approx(0.204202, abs=1e-6)
    assert best["fp_mass"] == pytest.approx(0.010075, abs=1e-6)
    assert best["fn_mass"] == pytest.approx(0.056295, abs=1e-6)
    assert sum(1 for r in plan.values() if r["is_best"]) == 1
    # monotone structure of the s-curve family: more bands => higher p at t
    ps = [plan[b]["p_at_threshold"] for b in (1, 2, 4, 8, 16, 32)]
    assert ps == sorted(ps)


def test_lsh_parameter_plan_validation(spark):
    from kafka_connect_tablestore_spark.operators.dedup import (
        lsh_parameter_plan,
    )

    with pytest.raises(ValueError, match="n_hashes"):
        lsh_parameter_plan(spark, n_hashes=0)
    with pytest.raises(ValueError, match="threshold"):
        lsh_parameter_plan(spark, threshold=1.0)
