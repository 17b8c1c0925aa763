"""Text/projection/optimize review hardening (round-5 final review of
text.py / errors.py / projection.py / synth.py / optimize.py — errors and
synth came out clean): empty-token semantics, BPE merge exhaustion, empty
corpora, envelope projection, grid-rooted vocab growth, and null-safe
skip stats.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import SinkConfig
from kafka_connect_tablestore_spark.functions.text import (
    bigram_perplexity,
    bpe_segment,
    perplexity_buckets,
    token_count,
    token_histogram,
    unigram_perplexity,
    vocab_growth,
    words,
)
from kafka_connect_tablestore_spark.lake.optimize import file_skip_stats
from kafka_connect_tablestore_spark.operators.projection import project_attributes


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_words_is_empty_safe(spark):
    d = _docs(spark, [(1, ""), (2, "   "), (3, "a b"), (4, None)])
    out = d.select("doc_id", F.size(words("text")).alias("n")).collect()
    got = {r["doc_id"]: r["n"] for r in out}
    # Spark size(null array) is -1; the point is 0 tokens for blank text
    assert got[1] == 0 and got[2] == 0 and got[3] == 2
    tc = {r["doc_id"]: r["n"] for r in d.select("doc_id", token_count("text").alias("n")).collect()}
    assert tc[1] == 0 and tc[2] == 0  # no phantom 1-token empty docs


def test_token_histogram_empty_bucket_reachable(spark):
    d = _docs(spark, [(1, ""), (2, "one two three")])
    out = token_histogram(d)
    buckets = {r["bucket"]: r for r in out.collect()}
    assert -1 in buckets  # the documented empty-doc bucket now fires


def test_unigram_perplexity_omits_empty_docs(spark):
    d = _docs(spark, [(1, "x x"), (2, "x y"), (3, "")])
    out = unigram_perplexity(d)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 2}  # the docstring's "no words -> omitted" is true now


def test_bpe_merge_exhaustion_keeps_vocab(spark):
    """All words fully merge before n_merges rounds: segmentation must
    still report real subword counts, not 0 for every doc."""
    d = _docs(spark, [(1, "ab ab"), (2, "ab")])
    out = bpe_segment(d, n_merges=4)
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"]) for r in out.collect()}
    assert got[1][0] == 2 and got[1][1] > 0
    assert got[2][1] > 0


def test_perplexity_buckets_empty_corpus(spark):
    empty = _docs(spark, []).where("doc_id > 0")
    out = perplexity_buckets(empty)
    assert out.count() == 0
    assert "ppl_bucket" in out.columns


def test_bigram_perplexity_still_correct(spark):
    d = _docs(spark, [(1, "a b a b"), (2, "a a a a")])
    got = {r["doc_id"]: r["n_bigrams"] for r in bigram_perplexity(d).collect()}
    assert got == {1: 3, 2: 3}


def test_project_attributes_keep_envelope_false_drops_envelope(spark):
    ddl = (
        "topic string, partition int, offset long, commit_ts long, op string, "
        "repo string, path string, lang string"
    )
    df = spark.createDataFrame([("t", 0, 0, 1, "PUT", "r", "p", "py")], ddl)
    out = project_attributes(df, SinkConfig(), keep_envelope=False)
    assert set(out.columns) == {"repo", "path", "lang"}  # no envelope leak


def test_vocab_growth_reports_zero_row_for_early_checkpoint(spark):
    d = _docs(spark, [(150, "alpha beta"), (250, "alpha gamma")])
    out = vocab_growth(d, checkpoints=(100, 200, 300))
    by_cp = {r["cp"]: (r["n_docs"], r["n_tokens"], r["vocab_size"]) for r in out.collect()}
    assert by_cp[100] == (0, 0, 0)  # present, not silently missing
    assert by_cp[200] == (1, 2, 2) and by_cp[300] == (2, 4, 3)


def test_file_skip_stats_handles_all_null_files(spark, tmp_path):
    path = str(tmp_path / "p")
    spark.createDataFrame(
        [(1, None), (2, None)], "id long, v long"
    ).coalesce(1).write.parquet(path)
    spark.createDataFrame(
        [(3, 10), (4, 20)], "id long, v long"
    ).coalesce(1).write.mode("append").parquet(path)
    stats = file_skip_stats(spark, path, "v", 5, 15)
    assert stats["files"] == 2 and stats["files_hit"] == 1
    assert stats["files_skipped"] == 1  # the all-null file is skippable
