"""Round-5 additions: the Gopher/MassiveText composite quality filter and
URL canonicalization + URL-level dedup.

Reference parity note: the reference sink has no text-quality or URL
operators — these belong to the training-data-pipeline family the brief
adds as first-class components alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.functions.text import gopher_quality
from kafka_connect_tablestore_spark.operators.corpus import (
    canonical_url,
    url_dedup,
)


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---- gopher_quality --------------------------------------------------------

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs off with "
    "a friend that it used to have known for many years before now "
    * 3
)


def _gq(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_quality(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_gopher_good_doc_keeps(spark):
    got = _gq(spark, [(1, GOOD)])
    r = got[1]
    assert r["keep"] is True
    assert r["n_words"] >= 50
    assert 3.0 <= r["mean_word_len"] <= 10.0
    assert r["stop_hits"] >= 2  # 'the', 'and', 'that', 'have', 'with'


def test_gopher_each_rule_fires_alone(spark):
    rows = [
        (1, GOOD),
        (2, "too short"),                                   # word-count floor
        (3, " ".join(["internationalization"] * 80)),       # mean word len
        (4, GOOD + " " + "#" * 40),                         # symbol ratio
        (5, "\n".join(["- " + GOOD] + ["- item"] * 99)),    # bullet lines
        (6, "\n".join([GOOD] + ["trailing..."] * 60)),      # ellipsis lines
        (7, GOOD + " " + " ".join(["12345"] * 60)),         # alpha fraction
        (8, " ".join(["alpha beta gamma delta"] * 30)),     # no stopwords
    ]
    got = _gq(spark, rows)
    assert got[1]["keep"] is True
    for i in range(2, 9):
        assert got[i]["keep"] is False, f"doc {i} should fail"
    # and each failing doc trips the rule it was built to trip
    assert got[2]["n_words"] < 50
    assert got[3]["mean_word_len"] > 10.0
    assert got[4]["symbol_word_ratio"] > 0.1
    assert got[5]["bullet_line_frac"] > 0.9
    assert got[6]["ellipsis_line_frac"] > 0.3
    assert got[7]["alpha_word_frac"] < 0.8
    assert got[8]["stop_hits"] < 2


def test_gopher_thresholds_are_parameters(spark):
    # the same short doc passes once the floor is lowered
    got = _gq(spark, [(1, "the cat and the dog have fun with it")],
              min_words=5)
    assert got[1]["keep"] is True


def test_gopher_is_map_only(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = physical_plan(gopher_quality(df))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


# ---- canonical_url / url_dedup ---------------------------------------------

def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonical_url("url")).collect()]


def test_canonical_url_rules(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Example.COM:443/A/b?b=2&a=1#frag",
        "http://example.com:80",
        "http://example.com/",
        "https://example.com/x?utm_source=feed&utm_campaign=c&q=1",
        "https://example.com/x?q=1",
        "https://example.com/x?fbclid=abc",
        "http://example.com:8080/y",
        "not a url",
        None,
    ])
    assert got[0] == "https://www.example.com/A/b?a=1&b=2"  # path case kept
    assert got[1] == "http://example.com/"
    assert got[2] == "http://example.com/"
    assert got[3] == "https://example.com/x?q=1"
    assert got[4] == "https://example.com/x?q=1"
    assert got[5] == "https://example.com/x"  # query emptied → no '?'
    assert got[6] == "http://example.com:8080/y"  # non-default port kept
    assert got[7] is None
    assert got[8] is None


def test_url_dedup_collapses_variants(spark):
    rows = [
        (1, "https://a.com/p?x=1&y=2"),
        (2, "https://A.COM:443/p?y=2&x=1&utm_source=s"),
        (3, "https://a.com/p?x=1&y=2#sec"),
        (4, "https://a.com/other"),
        (5, "junk"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["canon_url"]: r.asDict() for r in url_dedup(df).collect()}
    assert len(got) == 2
    merged = got["https://a.com/p?x=1&y=2"]
    assert merged["keep_id"] == 1 and merged["n_variants"] == 3
    assert got["https://a.com/other"]["n_variants"] == 1


def test_url_dedup_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/p")], "doc_id long, url string"
    )
    plan = physical_plan(url_dedup(df))
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_gopher_keep_all_cols_inline_gate(spark):
    df = spark.createDataFrame(
        [(1, GOOD, "en"), (2, "too short", "de")],
        "doc_id long, text string, lang string",
    )
    out = gopher_quality(df, keep_all_cols=True)
    assert set(df.columns) <= set(out.columns)
    kept = out.where("keep").collect()
    assert [r["doc_id"] for r in kept] == [1]
    assert kept[0]["lang"] == "en" and kept[0]["text"] == GOOD
    plan = physical_plan(out)
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
