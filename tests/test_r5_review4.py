"""Third closing review pass (operators/corpus.py): host normalization
edge cases, blank-text handling, null-safe rollups, the canonical_url
`ref` contract, and the index-API params guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.corpus import (
    canonical_url,
    chunk_dedup,
    filter_blocked_domains,
    pack_sequences,
    registrable_domain,
    source_scorecard,
    strip_boilerplate,
)


def _dom(spark, host):
    return (
        spark.createDataFrame([(host,)], "h string")
        .select(registrable_domain("h").alias("d"))
        .first()["d"]
    )


def test_registrable_domain_strips_trailing_dot(spark):
    assert _dom(spark, "evil.example.com.") == "example.com"
    assert _dom(spark, "EXAMPLE.CO.UK.") == "example.co.uk"
    assert _dom(spark, "example.com") == "example.com"


def test_registrable_domain_keeps_ip_hosts_whole(spark):
    assert _dom(spark, "93.184.216.34") == "93.184.216.34"
    assert _dom(spark, "10.0.0.1") == "10.0.0.1"
    # a numeric-looking but dotted NAME still splits normally
    assert _dom(spark, "1a.example.com") == "example.com"


def test_blocklist_not_bypassed_by_trailing_dot(spark):
    d = spark.createDataFrame(
        [
            (1, "see https://evil.example.com./x"),
            (2, "see https://evil.example.com/x"),
            (3, "see https://93.184.216.34/x"),
            (4, "no urls here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["blocked"]
        for r in filter_blocked_domains(
            d, ["example.com", "93.184.216.34"]
        ).collect()
    }
    assert out == {1: True, 2: True, 3: True, 4: False}


def test_blank_text_produces_no_phantom_chunk(spark):
    d = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "real words live here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_chunks"], r["n_kept"]) for r in chunk_dedup(d).collect()}
    # blank docs re-enter with zeros (the documented contract) instead of
    # one empty chunk that marks them duplicates of each other
    assert got[1] == (0, 0) and got[2] == (0, 0) and got[3] == (0, 0)
    assert got[4][0] >= 1
    sb = {r["doc_id"]: r["n_removed"] for r in strip_boilerplate(d, min_df=2).collect()}
    assert sb[1] == 0 and sb[2] == 0


def test_pack_sequences_null_text_is_zero_tokens(spark):
    d = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "d e")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pack_sequences(d, budget=4, n_groups=1).collect()}
    assert rows[2]["n_tokens"] == 0
    assert rows[2]["bin_id"] is not None and rows[2]["start_offset"] is not None
    # the zero-width doc does not shift its neighbors' offsets
    total = sum(r["n_tokens"] for r in rows.values())
    assert total == 5


def test_source_scorecard_counts_null_text_docs(spark):
    d = spark.createDataFrame(
        [
            (1, "hello world", "a"),
            (2, None, "a"),
            (3, "hello world", "a"),
        ],
        "doc_id long, text string, source string",
    )
    row = source_scorecard(d).collect()[0]
    assert row["n_docs"] == 3
    # doc 3 duplicates doc 1; the null-text doc is its own first occurrence
    assert row["dup_rate"] == round(1 / 3, 4)


def test_canonical_url_keeps_content_selecting_ref(spark):
    d = spark.createDataFrame(
        [
            ("https://gitlab.example.com/p/-/raw/f.txt?ref=v2.0",),
            ("https://x.example.com/a?utm_source=feed&b=2",),
        ],
        "u string",
    )
    got = [r["c"] for r in d.select(canonical_url("u").alias("c")).collect()]
    assert "ref=v2.0" in got[0]  # content-selecting param survives
    assert "utm_source" not in got[1] and "b=2" in got[1]  # trackers stripped


def test_batch_index_api_rejects_param_drift(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_dedup_exact,
    )

    docs = spark.createDataFrame(
        [(i, f"text {i % 5} body") for i in range(20)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "fp")
    build_fingerprint_index(docs, idx, n_buckets=64)
    with pytest.raises(ValueError, match="built with parameters"):
        incremental_dedup_exact(
            spark, idx, docs.where("doc_id >= 10"), n_buckets=32
        )
    # matching params pass; a rebuild may legitimately change them
    v, k = incremental_dedup_exact(
        spark, idx, docs.where("doc_id >= 10"), n_buckets=64
    )
    assert v.count() == 10
    build_fingerprint_index(docs, idx, n_buckets=32)  # rebuild re-freezes
    v2, _ = incremental_dedup_exact(
        spark, idx, docs.where("doc_id >= 10"), n_buckets=32
    )
    assert v2.count() == 10
