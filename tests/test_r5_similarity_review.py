"""Similarity/ANN review hardening (round-5 final review of similarity.py):
trainer input validation, small-corpus index param freezing, zero-vector
top-k safety, and the shared greedy-fixpoint/rank helpers.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.similarity import (
    brute_force_topk,
    build_semantic_index,
    incremental_semantic_dedup,
    last_semantic_dedup_stats,
    semantic_dedup,
    train_ivf_centroids,
    train_pq_codebooks,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_trainers_reject_empty_corpus(spark):
    empty = _vecs(spark, [])
    with pytest.raises(ValueError, match="empty corpus"):
        train_ivf_centroids(empty)
    with pytest.raises(ValueError, match="empty corpus"):
        train_pq_codebooks(empty, train="kmeans")


def test_pq_kmeans_rejects_short_vectors(spark):
    """Uniformly short vectors would silently train zero-width tail
    codebooks (recall collapse); both trainer paths now refuse."""
    short = _vecs(spark, [(i, [float(i), 1.0]) for i in range(20)])
    with pytest.raises(ValueError, match="shorter than dim"):
        train_pq_codebooks(short, m=2, n_codes=4, dim=4, train="kmeans")
    with pytest.raises(ValueError, match="shorter than dim"):
        train_pq_codebooks(short, m=2, n_codes=4, dim=4, train="first")
    # null-padded elements (the residual shape) are caught too
    padded = _vecs(spark, [(i, [1.0, None, 1.0, 1.0]) for i in range(8)])
    with pytest.raises(ValueError, match="null-padded"):
        train_pq_codebooks(padded, m=2, n_codes=4, dim=4, train="first")


def test_small_corpus_semantic_index_accepts_incremental_batches(spark, tmp_path):
    """A corpus smaller than n_cells yields fewer centroids; the frozen
    sidecar must match what incremental_semantic_dedup validates."""
    corpus = _vecs(spark, [(i, [float(i), 1.0, 0.0]) for i in range(6)])
    path = str(tmp_path / "sem")
    cents = build_semantic_index(corpus, path, threshold=0.99, n_cells=16)
    assert len(cents) == 6  # fewer than requested
    batch = _vecs(spark, [(100, [50.0, 1.0, 0.0])])
    per_vec, kept = incremental_semantic_dedup(
        spark, path, cents, batch, threshold=0.99
    )
    assert per_vec.count() == 1  # no params ValueError, batch processed


def test_zero_vector_never_occupies_topk_slot(spark):
    corpus = _vecs(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.9, 0.1])],
    )
    q = _vecs(spark, [(10, [1.0, 0.0])])
    out = brute_force_topk(corpus, q, k=3).collect()
    ids = [r["neighbor_id"] for r in out]
    assert 2 not in ids  # the zero vector is excluded, not ranked via NULL
    assert all(r["cos_sim"] is not None for r in out)


def test_semantic_dedup_accepts_precomputed_centroids(spark):
    corpus = _vecs(spark, [(i, [float(i % 3), 1.0]) for i in range(12)])
    cents = [[0.0, 1.0], [1.0, 1.0], [2.0, 1.0]]
    a = semantic_dedup(corpus, threshold=0.999, centroids=cents)
    b = semantic_dedup(corpus, threshold=0.999, n_cells=3, train="kmeans")
    # same survivors either way on this exactly-clustered corpus
    sa = {r["vec_id"] for r in a.where("is_survivor").collect()}
    sb = {r["vec_id"] for r in b.where("is_survivor").collect()}
    assert sa == sb
    assert last_semantic_dedup_stats()["mode"] == "greedy"
