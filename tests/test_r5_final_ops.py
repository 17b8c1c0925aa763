"""Round-5 final operator batch: C4 line-level cleaning, char-trigram
language ID, the linear quality-classifier head, and embedding-level
benchmark decontamination.

Scale invariants asserted here: the first three are map-only (zero Exchange
in the physical plan); semantic_decontaminate folds the collected benchmark
into ONE literal expression, so its plan has neither a join nor an Exchange.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.functions.text import (
    QUALITY_CLASSIFIER_WEIGHTS,
    ngram_lang_id,
    quality_classifier_score,
)
from kafka_connect_tablestore_spark.operators.corpus import c4_clean
from kafka_connect_tablestore_spark.operators.decontam import (
    semantic_decontaminate,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- c4_clean


def test_c4_line_rules(spark):
    df = spark.createDataFrame(
        [
            # 3 good lines, one short, one javascript -> kept page
            (
                0,
                "This opening line carries enough words to retain easily.\n"
                "short.\n"
                "Another quality line that ends properly with punctuation!\n"
                "This line mentions JavaScript so it must be dropped here.\n"
                "A third fine sentence that carries enough words to pass?",
            ),
            # lorem ipsum anywhere kills the page
            (
                1,
                "Line one is long enough to be retained for sure.\n"
                "lorem ipsum dolor sit amet goes here\n"
                "Another keeper line with plenty of words to count.",
            ),
            # '{' anywhere kills the page
            (
                2,
                "A good line that would otherwise be kept in the page.\n"
                "var x = { a: 1 };\n"
                "Another good line that would otherwise be kept here too.",
            ),
            # no terminal punctuation -> zero kept lines
            (3, "no terminal punctuation on this line at all\nalso none"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in c4_clean(df, min_line_words=5, min_lines=3).collect()
    }
    assert out[0]["n_lines"] == 5 and out[0]["n_kept"] == 3
    assert out[0]["keep"] is True
    assert "javascript" not in out[0]["clean_text"].lower()
    assert "short." not in out[0]["clean_text"]
    assert out[1]["has_lorem"] is True and out[1]["keep"] is False
    assert out[2]["has_brace"] is True and out[2]["keep"] is False
    assert out[3]["n_kept"] == 0 and out[3]["clean_text"] == ""


def test_c4_terminal_quote_counts(spark):
    df = spark.createDataFrame(
        [(0, 'He said the words were truly good enough to keep."')],
        ["doc_id", "text"],
    )
    r = c4_clean(df, min_line_words=5, min_lines=1).collect()[0]
    assert r["n_kept"] == 1 and r["keep"] is True


def test_c4_is_map_only(spark):
    df = spark.createDataFrame([(0, "x.")], ["doc_id", "text"])
    assert "Exchange" not in _plan(c4_clean(df))


# ------------------------------------------------------------ ngram_lang_id


def test_lang_id_classifies_obvious_text(spark):
    df = spark.createDataFrame(
        [
            (0, "The thing of the morning and the end of the day."),
            (1, "Der schnelle Fuchs und die Einsicht der Geschichte."),
            (2, "Les questions que nous posons dans la mesure des choses."),
            (3, "zz"),  # too short for a single trigram
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ngram_lang_id(df).collect()}
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "de"
    assert out[2]["lang"] == "fr"
    assert out[3]["lang"] == "und" and out[3]["confidence"] == 0.0


def test_lang_id_tie_is_first_wins(spark):
    # 'the' (en) and 'der' (de) exactly once each -> tie -> en (profile order)
    df = spark.createDataFrame([(0, "xthexxxderx")], ["doc_id", "text"])
    r = ngram_lang_id(df).collect()[0]
    assert r["en_hits"] == r["de_hits"] == 1
    assert r["lang"] == "en"


def test_lang_id_is_map_only(spark):
    df = spark.createDataFrame([(0, "abc")], ["doc_id", "text"])
    assert "Exchange" not in _plan(ngram_lang_id(df))


# ------------------------------------------- quality_classifier_score


def test_classifier_known_value(spark):
    # hand-compute the sigmoid from the rounded gopher signals
    text = " ".join(["the quick brown fox jumps over that lazy dog"] * 8)
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    r = quality_classifier_score(df).collect()[0]
    w = QUALITY_CLASSIFIER_WEIGHTS
    logit = (
        w["bias"]
        + w["log_n_words"] * math.log(1.0 + r["n_words"])
        + w["mean_word_len"] * r["mean_word_len"]
        + w["symbol_word_ratio"] * r["symbol_word_ratio"]
        + w["bullet_line_frac"] * r["bullet_line_frac"]
        + w["ellipsis_line_frac"] * r["ellipsis_line_frac"]
        + w["alpha_word_frac"] * r["alpha_word_frac"]
        + w["stop_hits"] * r["stop_hits"]
    )
    assert r["score"] == pytest.approx(1.0 / (1.0 + math.exp(-logit)), abs=1e-6)
    assert r["keep"] == (r["score"] >= 0.5)


def test_classifier_prefers_clean_text(spark):
    clean = " ".join(["a fine readable sentence with the usual words"] * 10)
    noisy = " ".join(["#### 123 $$$ ### !!!"] * 20)
    df = spark.createDataFrame([(0, clean), (1, noisy)], ["doc_id", "text"])
    out = {r["doc_id"]: r["score"] for r in quality_classifier_score(df).collect()}
    assert out[0] > out[1]


def test_classifier_custom_weights_and_threshold(spark):
    df = spark.createDataFrame([(0, "the word")], ["doc_id", "text"])
    r = quality_classifier_score(
        df, weights={"bias": 100.0}, threshold=0.99
    ).collect()[0]
    assert r["score"] == 1.0 and r["keep"] is True


def test_classifier_is_map_only(spark):
    df = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    assert "Exchange" not in _plan(quality_classifier_score(df))


# --------------------------------------------- semantic_decontaminate


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_semantic_decontam_flags_planted_duplicate(spark):
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0, 0.0]),  # exact dup of bench 10
            (2, [0.0, 1.0, 0.0]),  # orthogonal to every bench item
            (3, [0.96, 0.28, 0.0]),  # cos ~0.96 with bench 10
        ],
    )
    bench = _vecs(spark, [(10, [1.0, 0.0, 0.0]), (11, [0.0, 0.0, 1.0])])
    out = {r["vec_id"]: r for r in semantic_decontaminate(corpus, bench, tau=0.9).collect()}
    assert out[1]["contaminated"] is True and out[1]["bench_id"] == 10
    assert out[1]["best_cos"] == 1.0
    assert out[2]["contaminated"] is False and out[2]["best_cos"] == 0.0
    assert out[3]["contaminated"] is True and out[3]["bench_id"] == 10


def test_semantic_decontam_tie_takes_smallest_bench_id(spark):
    corpus = _vecs(spark, [(1, [1.0, 0.0])])
    bench = _vecs(spark, [(20, [2.0, 0.0]), (10, [3.0, 0.0])])
    r = semantic_decontaminate(corpus, bench, tau=0.99).collect()[0]
    assert r["best_cos"] == 1.0 and r["bench_id"] == 10


def test_semantic_decontam_zero_norm_corpus_vector(spark):
    corpus = _vecs(spark, [(1, [0.0, 0.0])])
    bench = _vecs(spark, [(10, [1.0, 0.0])])
    r = semantic_decontaminate(corpus, bench).collect()[0]
    assert r["best_cos"] is None and r["bench_id"] is None
    assert r["contaminated"] is False


def test_semantic_decontam_empty_bench_raises(spark):
    corpus = _vecs(spark, [(1, [1.0])])
    with pytest.raises(ValueError, match="empty benchmark"):
        semantic_decontaminate(corpus, corpus.where("vec_id < 0"))


def test_semantic_decontam_max_bench_raises(spark):
    corpus = _vecs(spark, [(1, [1.0]), (2, [2.0]), (3, [3.0])])
    with pytest.raises(ValueError, match="max_bench"):
        semantic_decontaminate(corpus, corpus, max_bench=2)


def test_semantic_decontam_plan_has_no_join_or_shuffle(spark):
    """The scale contract: the benchmark rides in a literal, so scoring the
    corpus is one map-only pass — no join node, no Exchange."""
    corpus = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    bench = _vecs(spark, [(10, [1.0, 0.0])])
    plan = _plan(semantic_decontaminate(corpus, bench))
    assert "Join" not in plan and "Exchange" not in plan


# ------------------------------------------------- gopher_repetition


def test_gopher_repetition_known_values(spark):
    from kafka_connect_tablestore_spark.functions.text import (
        gopher_repetition,
    )

    df = spark.createDataFrame(
        [
            # two identical lines out of three; "alpha beta gamma" 3-gram x2
            (0, "alpha beta gamma\nalpha beta gamma\nunique line here"),
            # single line, one word repeated 12 times
            (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in gopher_repetition(df).collect()}
    r0 = out[0]
    assert r0["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)
    # repeated line = 16 chars of 50 total
    assert r0["dup_line_char_frac"] == pytest.approx(16 / 50, abs=1e-4)
    # canonical len = 50; top 3-gram 'alpha beta gamma' x2 = 32 chars
    assert r0["top_3gram_char_frac"] == pytest.approx(32 / 50, abs=1e-4)
    assert r0["dup_5gram_char_frac"] == 0.0
    r1 = out[1]
    # 'spam spam' count 11 x 9 chars, capped at 1.0
    assert r1["top_2gram_char_frac"] == 1.0
    assert r1["dup_10gram_char_frac"] == 1.0  # 3 occurrences x 49 chars
    r2 = out[2]
    assert all(
        r2[c] == 0.0 for c in r2.asDict() if c.endswith("frac")
    ), "empty doc must report zero coverage, not 1.0"


def test_gopher_repetition_top_gram_tie_rule(spark):
    """All grams unique -> tie on count -> the LONGEST gram wins (then
    lexicographically greatest), matching the SQL twin's ordering."""
    from kafka_connect_tablestore_spark.functions.text import (
        gopher_repetition,
    )

    df = spark.createDataFrame(
        [(0, "aa bb cccccc dd")], ["doc_id", "text"]
    )
    r = gopher_repetition(df, top_ns=(2,), dup_ns=(5,)).collect()[0]
    # canonical len 15; longest 2-gram is 'cccccc dd' (9) or 'bb cccccc' (9)
    # -> length tie -> lexicographically greatest = 'cccccc dd'
    assert r["top_2gram_char_frac"] == pytest.approx(9 / 15, abs=1e-4)


def test_gopher_repetition_no_window_in_plan(spark):
    """Skew contract: two key-local aggregations + one id join — no
    window, so a hot doc can't serialize beyond its own gram set."""
    from kafka_connect_tablestore_spark.functions.text import (
        gopher_repetition,
    )

    df = spark.createDataFrame([(0, "a b c d e f")], ["doc_id", "text"])
    plan = _plan(gopher_repetition(df))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
