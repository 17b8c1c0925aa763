"""Cross-corpus dedup (exact + near-dup) and BPE pair counting.

Semantics pinned here: frame identity (id spaces may overlap between the
NEW and PRIOR frames), no within-frame pairs from the bipartite join, the
joint hot-bucket cap, per-new-doc verdict completeness, the smallest-
prior-id tie rule, and BPE pairs never crossing a piece boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.functions.text import bpe_pair_counts
from kafka_connect_tablestore_spark.operators.dedup import (
    cross_dedup_exact,
    cross_lsh_pairs,
    cross_neardup,
)


def _frames(spark):
    new = spark.createDataFrame(
        [
            # exact dup of prior doc 100 (after whitespace normalization)
            (1, "The   shared page body appears in both crawls with stable words."),
            # near-dup of prior doc 101 (one word swapped at the end)
            (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
            # unique to the new crawl
            (3, "completely different content about databases and distributed systems processing"),
            # too short to shingle
            (4, "hi"),
        ],
        "doc_id long, text string",
    )
    prior = spark.createDataFrame(
        [
            (100, "the shared page body appears in both crawls with stable words."),
            (101, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),
            # id COLLIDES with new doc 3 — identity must be the frame
            (3, "prior content that happens to reuse a new-crawl id but shares no words"),
        ],
        "doc_id long, text string",
    )
    return new, prior


def test_cross_exact_verdicts(spark):
    new, prior = _frames(spark)
    got = {r["doc_id"]: r["in_prior"] for r in cross_dedup_exact(new, prior).collect()}
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_cross_lsh_no_within_frame_pairs(spark):
    new, prior = _frames(spark)
    pairs = cross_lsh_pairs(new, prior).collect()
    new_ids = {1, 2, 3, 4}
    prior_ids = {100, 101, 3}
    for r in pairs:
        assert r["doc_id"] in new_ids
        assert r["prior_id"] in prior_ids
    # the exact dup and the near-dup must both surface as candidates
    got = {(r["doc_id"], r["prior_id"]) for r in pairs}
    assert (1, 100) in got and (2, 101) in got


def test_cross_neardup_covers_every_new_doc(spark):
    new, prior = _frames(spark)
    rows = {r["doc_id"]: r for r in cross_neardup(new, prior, threshold=0.5).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1]["is_dup"] and rows[1]["prior_id"] == 100
    assert rows[1]["best_jaccard"] == 1.0
    assert rows[2]["is_dup"] and rows[2]["prior_id"] == 101
    assert 0.5 <= rows[2]["best_jaccard"] < 1.0
    for clean in (3, 4):
        r = rows[clean]
        assert not r["is_dup"]
        assert r["best_jaccard"] == 0.0
        assert r["prior_id"] is None


def test_cross_neardup_tie_prefers_smallest_prior_id(spark):
    text = "the quick brown fox jumps over the lazy dog near the river bank"
    new = spark.createDataFrame([(1, text)], "doc_id long, text string")
    prior = spark.createDataFrame(
        [(200, text), (150, text)], "doc_id long, text string"
    )
    r = cross_neardup(new, prior, threshold=0.5).collect()[0]
    assert r["best_jaccard"] == 1.0
    assert r["prior_id"] == 150


def test_cross_lsh_joint_bucket_cap(spark):
    flood = "this boilerplate banner repeats verbatim across every single page today"
    new = spark.createDataFrame(
        [(i, flood) for i in range(10)], "doc_id long, text string"
    )
    prior = spark.createDataFrame(
        [(100 + i, flood) for i in range(10)], "doc_id long, text string"
    )
    uncapped = cross_lsh_pairs(new, prior)
    assert uncapped.count() == 100  # 10 x 10 identical docs collide fully
    # joint bucket population is 20 > 4 in every band -> all dropped
    assert cross_lsh_pairs(new, prior, max_bucket=4).count() == 0


def test_bpe_pair_counts_hand_example(spark):
    df = spark.createDataFrame(
        # pieces (lowered, trimmed): 'abab', 'cd', 'x' (dropped: len < 2)
        [(0, "Abab cd x"), (1, "abab")],
        "doc_id long, text string",
    )
    got = {r["pair"]: (r["n_occurrences"], r["n_docs"])
           for r in bpe_pair_counts(df, topk=10).collect()}
    # 'abab' -> ab, ba, ab per doc; piece boundary contributes no 'b c'
    assert got["ab"] == (4, 2)
    assert got["ba"] == (2, 2)
    assert got["cd"] == (1, 1)
    assert "b c" not in got and "bc" not in got and "d x" not in got


def test_bpe_pair_ordering_is_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "aa bb"), (1, "aa bb"), (2, "cc cc cc")],
        "doc_id long, text string",
    )
    rows = bpe_pair_counts(df, topk=3).collect()
    # cc: 3 occurrences (1 doc); aa/bb: 2 occurrences (2 docs) — pair text
    # breaks the aa/bb tie ascending
    assert [(r["pair"], r["n_occurrences"], r["n_docs"]) for r in rows] == [
        ("cc", 3, 1), ("aa", 2, 2), ("bb", 2, 2),
    ]


# ------------------------------------------------------------ train_bpe


def test_bpe_train_hand_example(spark):
    from kafka_connect_tablestore_spark.functions.text import train_bpe_merges

    df = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab ab")], "doc_id long, text string"
    )
    rows = [
        (r["rank"], r["pair"], r["new_token"], r["freq"])
        for r in train_bpe_merges(df, n_merges=4).orderBy("rank").collect()
    ]
    # round 1: 'a a' weighted 6 (two pairs per 'aaab' x count 3);
    # round 2: 'a b' 4; round 3: 'aa ab' 3; round 4: pairs exhausted -> no row.
    # 'aaa' under merge (a,a) folds greedily left-to-right to [aa, a].
    assert rows == [
        (1, "a a", "aa", 6),
        (2, "a b", "ab", 4),
        (3, "aa ab", "aaab", 3),
    ]


def test_bpe_train_boundary_anchoring_and_ties(spark):
    from kafka_connect_tablestore_spark.functions.text import train_bpe_merges

    df = spark.createDataFrame(
        [(0, "xa xa ab xab")], "doc_id long, text string"
    )
    rows = [
        (r["rank"], r["pair"], r["freq"])
        for r in train_bpe_merges(df, n_merges=4).orderBy("rank").collect()
    ]
    # r1: 'x a' (3) beats 'a b' (2).  r2: after (x,a), 'xab' is [xa, b] —
    # the symbol 'xa' merely ENDS in 'a', so merge candidates are 'a b'
    # (from 'ab') and 'xa b'; the 1-1 tie breaks to the smaller pair text.
    # r3: 'xa b' merges the remaining pair; r4: exhausted.
    assert rows == [(1, "x a", 3), (2, "a b", 1), (3, "xa b", 1)]


def test_bpe_train_is_deterministic_across_partitionings(spark):
    from kafka_connect_tablestore_spark.functions.text import train_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = train_bpe_merges(docs, n_merges=3).collect()
    b = train_bpe_merges(docs.repartition(7), n_merges=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_segment_counts_via_trained_vocab(spark):
    from kafka_connect_tablestore_spark.functions.text import bpe_segment

    df = spark.createDataFrame(
        [(0, "aaab aaab"), (1, "aaab ab"), (2, "")],
        "doc_id long, text string",
    )
    # after 3 merges 'aaab' and 'ab' are single tokens; after only 1 merge
    # ('a a') they segment as [aa, a, b] and [a, b]
    got3 = {r["doc_id"]: (r["n_words"], r["n_subwords"])
            for r in bpe_segment(df, n_merges=3).collect()}
    assert got3 == {0: (2, 2), 1: (2, 2), 2: (0, 0)}
    got1 = {r["doc_id"]: (r["n_words"], r["n_subwords"])
            for r in bpe_segment(df, n_merges=1).collect()}
    assert got1 == {0: (2, 6), 1: (2, 5), 2: (0, 0)}


def test_new_ops_plans_are_window_free(spark):
    """A hot new-doc colliding with thousands of prior variants must
    pre-reduce through partial aggregation, never rank through a window;
    the BPE apply path likewise rolls up through aggregations only."""
    from kafka_connect_tablestore_spark.functions.text import bpe_segment

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.where(F.col("doc_id") % 2 == 1)
    prior = docs.where(F.col("doc_id") % 2 == 0)
    plan_nd = (
        cross_neardup(new, prior)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan_nd
    plan_seg = (
        bpe_segment(docs, n_merges=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan_seg
