"""Dedup/decontam review hardening (round-5 final review of dedup.py /
clustering.py / decontam.py): LSH parameter validation, degenerate-doc
cliques, 0/0 Jaccard, crash-safe bloom compaction, dimension-drift refusal,
and rounded-verdict determinism.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.decontam import (
    benchmark_overlap,
    semantic_decontaminate,
)
from kafka_connect_tablestore_spark.operators.dedup import (
    append_to_bloom_index,
    build_bloom_index,
    compact_bloom_index,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_params_validated(spark):
    d = _docs(spark, [(1, "a b c d e")])
    with pytest.raises(ValueError, match="divisor"):
        minhash_lsh_pairs(d, bands=16)  # n_hashes=8 -> r=0 all-pairs hazard
    with pytest.raises(ValueError, match="divisor"):
        minhash_lsh_pairs(d, n_hashes=8, bands=3)  # silent prefix banding


def test_ngram_jaccard_empty_shingle_pair_scores_zero(spark):
    """Two identical 3-word docs collide in every band; with k=5 both
    verify-side shingle sets are empty — score 0.0, never 0/0."""
    d = _docs(spark, [(1, "alpha beta gamma"), (2, "alpha beta gamma")])
    out = ngram_jaccard_pairs(d, k=5).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 0.0


def test_simhash_degenerate_docs_do_not_clique(spark):
    """Null/empty-text docs share one simhash; they must be excluded from
    the band join instead of forming a quadratic bucket."""
    rows = [(i, None if i % 2 else "   ") for i in range(20)]
    rows += [(100, "real content words here"), (101, "real content words here")]
    out = simhash_neardup_pairs(_docs(spark, rows)).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert pairs == {(100, 101)}  # no degenerate-doc pairs at all


def test_compact_bloom_index_is_crash_safe(spark, tmp_path):
    path = str(tmp_path / "bloom")
    docs = _docs(spark, [(i, f"doc number {i}") for i in range(50)])
    build_bloom_index(docs, path, m_bits=1 << 12, k=3)
    more = _docs(spark, [(i, f"extra {i}") for i in range(50, 80)])
    from kafka_connect_tablestore_spark.operators.dedup import build_bloom_bitset

    append_to_bloom_index(build_bloom_bitset(more, 1 << 12, 3), path)
    before = (
        spark.read.parquet(path).groupBy("word_idx").agg(F.bit_or("word").alias("w"))
    )
    before_rows = {(r["word_idx"], r["w"]) for r in before.collect()}
    compact_bloom_index(spark, path)
    after = {(r["word_idx"], r["word"]) for r in spark.read.parquet(path).collect()}
    assert after == before_rows  # OR-equivalent, now one row per word
    # a crashed prior compaction (leftover .old) is refused, not clobbered
    os.makedirs(path + ".old")
    with pytest.raises(RuntimeError, match="recover_compaction"):
        compact_bloom_index(spark, path)
    os.rmdir(path + ".old")


def test_semantic_decontaminate_refuses_dimension_drift(spark):
    bench = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    good = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = semantic_decontaminate(good, bench, tau=0.9).collect()
    assert out[0]["contaminated"] is True
    bad = spark.createDataFrame(
        [(11, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="corpus vector dim"):
        semantic_decontaminate(bad, bench, tau=0.9).collect()
    ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged benchmark"):
        semantic_decontaminate(good, ragged)
    nonfinite = spark.createDataFrame(
        [(1, [float("inf"), 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="non-finite"):
        semantic_decontaminate(good, nonfinite)


def test_contamination_verdict_matches_emitted_score(spark):
    """The verdict must be reproducible from the rounded emitted column:
    raw 0.49996 rounds to 0.5 and must read contaminated at threshold 0.5."""
    # corpus doc shares exactly 1 of its 2 distinct 3-shingles? build a case
    # via cosine instead: raw cos = 0.89996... rounds to 0.9 at tau=0.9
    import math

    a = math.sqrt(1 - 0.89996**2)
    bench = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(10, [0.89996, a])], "vec_id long, embedding array<double>"
    )
    r = semantic_decontaminate(corpus, bench, tau=0.9).collect()[0]
    assert r["best_cos"] == 0.9 and r["contaminated"] is True


def test_eager_false_returns_sig_cache_handle(spark):
    d = _docs(spark, [(1, "w x y z q"), (2, "w x y z q")])
    pairs = minhash_lsh_pairs(d, eager=False)
    assert pairs.count() == 1
    handle = pairs._sig_cache
    assert handle.storageLevel.useMemory
    handle.unpersist()
    assert not handle.storageLevel.useMemory
