"""ExactSubstr-style duplicated-span coverage (Lee et al. 2022):
known-value interval-union math, cross-doc-only semantics, edge cases."""

from __future__ import annotations

import pytest

from kafka_connect_tablestore_spark.operators.dedup import dup_span_coverage


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_shared_run_exact_interval_union(spark):
    # docs 1 and 2 share the 7-word run "a b c d e f g"; with n=5 that is
    # duplicated windows at positions 1,2,3 in doc 1 — three overlapping
    # intervals [1,5],[2,6],[3,7] whose union is 7 words, NOT 3*5=15.
    shared = "a b c d e f g"
    rows = [
        (1, shared + " x1 y1 z1"),          # 10 words
        (2, "p2 q2 " + shared),             # 9 words, run at positions 3..9
        (3, "u3 v3 w3 x3 y3 z3"),           # 6 words, nothing shared
    ]
    out = _by_id(dup_span_coverage(_docs(spark, rows), n=5, min_df=2))
    assert out[1]["n_words"] == 10
    assert out[1]["dup_windows"] == 3
    assert out[1]["dup_words"] == 7
    assert out[1]["dup_coverage"] == pytest.approx(0.7)
    assert out[2]["dup_windows"] == 3
    assert out[2]["dup_words"] == 7
    assert out[2]["dup_coverage"] == pytest.approx(round(7 / 9, 4))
    assert out[3]["dup_windows"] == 0
    assert out[3]["dup_words"] == 0
    assert out[3]["dup_coverage"] == 0.0


def test_disjoint_duplicated_spans_sum_without_overlap(spark):
    # two separate shared 5-word runs inside one doc, separated by unique
    # words: each contributes exactly 5 covered words (gap > n).
    run_a, run_b = "a1 a2 a3 a4 a5", "b1 b2 b3 b4 b5"
    rows = [
        (1, run_a + " u1 u2 u3 " + run_b),  # 13 words, runs at 1 and 9
        (2, run_a),
        (3, run_b),
    ]
    out = _by_id(dup_span_coverage(_docs(spark, rows), n=5, min_df=2))
    assert out[1]["dup_windows"] == 2
    assert out[1]["dup_words"] == 10
    assert out[1]["dup_coverage"] == pytest.approx(round(10 / 13, 4))
    # the 5-word docs are fully covered
    assert out[2]["dup_words"] == 5 and out[2]["dup_coverage"] == 1.0
    assert out[3]["dup_words"] == 5 and out[3]["dup_coverage"] == 1.0


def test_within_doc_repetition_alone_is_not_cross_doc_duplication(spark):
    # doc 1 repeats its own 5-gram twice, but no OTHER doc contains it:
    # min_df counts distinct documents, so nothing is flagged.
    rows = [
        (1, "r1 r2 r3 r4 r5 mid r1 r2 r3 r4 r5"),
        (2, "s1 s2 s3 s4 s5 s6"),
    ]
    out = _by_id(dup_span_coverage(_docs(spark, rows), n=5, min_df=2))
    assert out[1]["dup_windows"] == 0
    assert out[2]["dup_windows"] == 0


def test_short_docs_and_identical_docs(spark):
    rows = [
        (1, "one two three"),                 # < n words: no windows
        (2, "c1 c2 c3 c4 c5 c6"),
        (3, "c1 c2 c3 c4 c5 c6"),             # identical twin: full coverage
    ]
    out = _by_id(dup_span_coverage(_docs(spark, rows), n=5, min_df=2))
    assert out[1]["dup_windows"] == 0 and out[1]["dup_coverage"] == 0.0
    for i in (2, 3):
        assert out[i]["dup_windows"] == 2
        assert out[i]["dup_words"] == 6
        assert out[i]["dup_coverage"] == 1.0


def test_validation():
    with pytest.raises(ValueError):
        dup_span_coverage(None, n=0)
    with pytest.raises(ValueError):
        dup_span_coverage(None, min_df=1)
