"""Round-5 batch 2: GPT-2-style BPE token estimate, corpus top-n-grams,
shingle containment verify, and temperature-based mixture sampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.functions.text import (
    bpe_token_count,
    top_ngrams,
)
from kafka_connect_tablestore_spark.operators.corpus import (
    temperature_rates,
    temperature_sample,
)
from kafka_connect_tablestore_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)


# ---- bpe_token_count --------------------------------------------------------

def _bpe(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(bpe_token_count("text").alias("n")).collect()[0]["n"]


def test_bpe_short_words_one_each(spark):
    # six pieces, every trimmed piece <= 4 chars -> 1 subword each
    assert _bpe(spark, "key agg row scan slow fast") == 6


def test_bpe_long_word_charged_len_over_4(spark):
    # ceil(20/4) = 5
    assert _bpe(spark, "internationalization") == 5


def test_bpe_contraction_splits(spark):
    # don(1) + 't(1) + stop(1)
    assert _bpe(spark, "don't stop") == 3


def test_bpe_digits_and_punct_are_separate_pieces(spark):
    # abc(1) + 123(1) + !!(1)
    assert _bpe(spark, "abc 123 !!") == 3


def test_bpe_null_and_empty_are_zero(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "text string")
    got = [r["n"] for r in df.select(bpe_token_count("text").alias("n")).collect()]
    assert got == [0, 0, 0]


# ---- top_ngrams -------------------------------------------------------------

def test_top_ngrams_counts_docs_and_occurrences(spark):
    df = spark.createDataFrame(
        [
            (1, "visit our site visit our site"),   # trigram twice in doc 1
            (2, "visit our site now"),
            (3, "something else entirely here"),
        ],
        "doc_id long, text string",
    )
    top = top_ngrams(df, k=3, topk=2).collect()
    assert top[0]["ngram"] == "visit our site"
    assert top[0]["n_docs"] == 2
    # doc 1: positions 1 and 4 -> 2 occurrences; doc 2: 1 -> 3 total
    assert top[0]["n_occurrences"] == 3


def test_top_ngrams_tie_broken_by_text(spark):
    df = spark.createDataFrame(
        [(1, "b b b"), (2, "a a a")], "doc_id long, text string"
    )
    top = top_ngrams(df, k=3, topk=2).collect()
    assert [r["ngram"] for r in top] == ["a a a", "b b b"]


# ---- containment_pairs ------------------------------------------------------

def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    # doc 1 is quoted verbatim inside doc 2, which is 4x longer: shingle
    # containment = 1.0, jaccard well under 0.5
    quote = "the quick brown fox jumps over the lazy dog today"
    filler = " ".join(f"filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler)], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    cont = containment_pairs(df, candidates=cand).collect()[0]["containment"]
    jac = ngram_jaccard_pairs(df, candidates=cand).collect()[0]["jaccard"]
    assert cont == 1.0
    assert jac < 0.5


def test_containment_threshold_filters(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "u v w x y z")], "doc_id long, text string"
    )
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    assert containment_pairs(df, candidates=cand, threshold=0.5).count() == 0


# ---- temperature sampling ---------------------------------------------------

def _mix(spark):
    # en: 30 docs x 3 tokens = 90 tokens; fr: 5 docs x 2 tokens = 10 tokens
    rows = [(i, "en", "one two three") for i in range(30)]
    rows += [(100 + i, "fr", "un deux") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_temperature_rates_known_values(spark):
    r = {x["lang"]: x for x in temperature_rates(_mix(spark), "lang").collect()}
    assert r["en"]["n_tokens"] == 90 and r["fr"]["n_tokens"] == 10
    assert r["en"]["share"] == 0.9 and r["fr"]["share"] == 0.1
    # rate_g = sqrt(min_n / n_g): fr keeps everything, en thinned to 1/3
    assert r["fr"]["keep_rate"] == 1.0
    assert r["en"]["keep_rate"] == round(math.sqrt(10 / 90), 6)


def test_temperature_sample_keeps_rarest_group_whole(spark):
    out = temperature_sample(_mix(spark), "lang")
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["fr"] == 5                       # rate 1.0 -> all kept
    # en expected ~30/3 = 10; hash gate is uniform, allow slack
    assert 4 <= by_lang.get("en", 0) <= 17


def test_temperature_sample_stable_under_repartition(spark):
    a = {r["doc_id"] for r in temperature_sample(_mix(spark), "lang").collect()}
    b = {
        r["doc_id"]
        for r in temperature_sample(_mix(spark).repartition(7), "lang").collect()
    }
    assert a == b


def test_temperature_alpha_one_keeps_everything(spark):
    # alpha=1 -> q == p -> every keep rate is 1.0
    out = temperature_sample(_mix(spark), "lang", alpha=1.0)
    assert out.count() == 35


def test_temperature_alpha_validated(spark):
    with pytest.raises(ValueError):
        temperature_rates(_mix(spark), "lang", alpha=1.5)


def test_temperature_sample_plan_is_broadcast_map_only(spark):
    # the corpus side must not shuffle: the rate plan broadcasts in
    plan = temperature_sample(_mix(spark), "lang")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ---- perplexity_buckets -----------------------------------------------------

def test_ppl_buckets_orders_fluency(spark):
    from kafka_connect_tablestore_spark.functions.text import (
        perplexity_buckets,
    )

    # doc 1 repeats the corpus's dominant words (low ppl); doc 3 is all
    # hapaxes (highest ppl); doc 2 mixes
    df = spark.createDataFrame(
        [
            (1, "the the the cat cat"),
            (2, "the cat sat on mats"),
            (3, "zyx wvu tsr qpo nml"),
            (4, "the the cat cat sat"),
            (5, "the cat the cat the"),
            (6, "sat on the cat mats"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in perplexity_buckets(df, n_buckets=3).collect()}
    assert out[3]["ppl_bucket"] == 3          # hapax soup lands in the tail
    assert out[5]["ppl_bucket"] == 1          # most fluent lands in the head
    # buckets are monotone in perplexity
    rows = sorted(out.values(), key=lambda r: r["unigram_ppl"])
    bks = [r["ppl_bucket"] for r in rows]
    assert bks == sorted(bks)


def test_ppl_buckets_no_global_window(spark):
    from kafka_connect_tablestore_spark.functions.text import (
        perplexity_buckets,
    )

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    plan = perplexity_buckets(df)._jdf.queryExecution().executedPlan().toString()
    # threshold assignment must be map-only: no Window node anywhere
    assert "Window" not in plan


def test_ppl_buckets_validates(spark):
    from kafka_connect_tablestore_spark.functions.text import (
        perplexity_buckets,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        perplexity_buckets(df, n_buckets=1)


# ---- mixture_plan -----------------------------------------------------------

def test_mixture_plan_known_values(spark):
    from kafka_connect_tablestore_spark.operators.corpus import mixture_plan

    # en supplies 90 tokens, fr supplies 10
    df = _mix(spark)
    plan = {
        r["lang"]: r
        for r in mixture_plan(
            df, {"en": 1.0, "fr": 3.0}, budget_tokens=100, group_col="lang"
        ).collect()
    }
    assert plan["en"]["n_tokens"] == 90 and plan["fr"]["n_tokens"] == 10
    assert plan["en"]["target_share"] == 0.25 and plan["fr"]["target_share"] == 0.75
    assert plan["en"]["target_tokens"] == 25 and plan["fr"]["target_tokens"] == 75
    # fr must repeat 7.5x to meet its share; en subsamples to 0.2778
    assert plan["fr"]["epochs"] == 7.5
    assert plan["en"]["epochs"] == round(25 / 90, 4)


def test_mixture_plan_unweighted_group_reported_zero(spark):
    from kafka_connect_tablestore_spark.operators.corpus import mixture_plan

    plan = {
        r["lang"]: r
        for r in mixture_plan(
            _mix(spark), {"fr": 1.0}, budget_tokens=100, group_col="lang"
        ).collect()
    }
    assert plan["en"]["target_tokens"] == 0 and plan["en"]["epochs"] == 0.0


def test_mixture_plan_missing_weighted_group_raises(spark):
    from kafka_connect_tablestore_spark.operators.corpus import mixture_plan

    with pytest.raises(ValueError, match="absent"):
        mixture_plan(_mix(spark), {"zz": 1.0}, budget_tokens=100, group_col="lang")


# ---- knn_graph ----------------------------------------------------------------

def test_knn_graph_matches_ann_ivf_all_queries(spark):
    from kafka_connect_tablestore_spark.operators.similarity import (
        ann_ivf_topk,
        knn_graph,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .where("vec_id < 120")
    )
    got = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in knn_graph(emb, k=3, n_cells=8, nprobe=2).collect()
    }
    # same math as the broadcast-query path with queries = corpus
    want = {
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in ann_ivf_topk(emb, emb, k=3, n_cells=8, nprobe=2).collect()
    }
    assert got == want and len(got) == 120 * 3


def test_knn_graph_duplicate_vector_is_own_nearest(spark):
    from kafka_connect_tablestore_spark.operators.similarity import knn_graph

    rows = [(i, [float(i + 1), 1.0, 0.0]) for i in range(20)]
    rows.append((99, [5.0, 1.0, 0.0]))          # exact duplicate of vec 4
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = {
        (r["query_id"], r["rank"]): r
        for r in knn_graph(df, k=2, n_cells=4, nprobe=2).collect()
    }
    assert g[(99, 1)]["neighbor_id"] == 4 and g[(99, 1)]["cos_sim"] == 1.0
    assert g[(4, 1)]["neighbor_id"] == 99 and g[(4, 1)]["cos_sim"] == 1.0


# ---- persisted exact-dedup fingerprint index (sixth index) --------------------

def test_fingerprint_index_three_cycle_equals_batch(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.dedup import (
        append_to_fingerprint_index,
        build_fingerprint_index,
        dedup_exact,
        incremental_dedup_exact,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 300")
    )
    # inject cross-day exact duplicates so the index actually fires
    dup = docs.where("doc_id < 10").selectExpr("doc_id + 1000 AS doc_id", "text")
    corpus = docs.unionByName(dup)

    idx = str(tmp_path / "fp_idx")
    days = [
        corpus.where("doc_id < 100"),
        corpus.where("doc_id >= 100 and doc_id < 200"),
        corpus.where("doc_id >= 200"),            # includes the 1000+ dups
    ]
    build_fingerprint_index(days[0], idx, n_buckets=16)
    kept_ids = {
        r["doc_id"]
        for r in dedup_exact(days[0]).selectExpr("keep_id AS doc_id").collect()
    }
    for day in days[1:]:
        verdicts, kept = incremental_dedup_exact(spark, idx, day, n_buckets=16)
        kept_ids |= {r["doc_id"] for r in verdicts.where("kept").collect()}
        append_to_fingerprint_index(kept, idx)

    want = {r["keep_id"] for r in dedup_exact(corpus).collect()}
    assert kept_ids == want
    # the injected duplicates were recognized across days
    assert all(1000 + i not in kept_ids for i in range(10))
    # index holds exactly one row per distinct content
    assert spark.read.parquet(idx).count() == len(want)


def test_fingerprint_index_probe_prunes_partitions(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_dedup_exact,
    )

    docs = spark.createDataFrame(
        [(i, f"content number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "fp_idx")
    build_fingerprint_index(docs, idx, n_buckets=16)
    batch = spark.createDataFrame(
        [(100, "content number 3"), (101, "brand new content")],
        "doc_id long, text string",
    )
    verdicts, _ = incremental_dedup_exact(spark, idx, batch, n_buckets=16)
    got = {r["doc_id"]: r["kept"] for r in verdicts.collect()}
    assert got == {100: False, 101: True}
