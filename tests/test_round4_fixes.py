"""Round-4 hardening: hot-bucket caps on every banded self-join,
cluster-derived parallelism defaults, and the embedded public-suffix table
(round-3 verdict directives 2-4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_neardup_pairs,
)


def _boilerplate_docs(spark, n_hot: int = 30, n_normal: int = 6):
    """A corpus with one boilerplate group (n_hot identical licence
    headers — every LSH band bucket for them is size n_hot) plus a few
    genuinely distinct docs with one near-dup pair."""
    hot = [
        (i, "permission is hereby granted free of charge to any person "
            "obtaining a copy of this software and associated files")
        for i in range(n_hot)
    ]
    normal = [
        (100, "the quick brown fox jumps over the lazy dog near the river"),
        (101, "the quick brown fox jumps over the lazy dog near the creek"),
        (102, "completely different text about spark partition strategies"),
        (103, "yet another unrelated document mentioning window functions"),
        (104, "bucketed joins avoid shuffles when tables share a layout"),
        (105, "adaptive execution replans skewed stages at runtime"),
    ][:n_normal]
    return spark.createDataFrame(hot + normal, "doc_id long, text string")


def test_minhash_lsh_hot_bucket_cap(spark):
    d = _boilerplate_docs(spark)
    uncapped = minhash_lsh_pairs(d).select("doc_a", "doc_b").collect()
    capped = minhash_lsh_pairs(d, max_bucket=10).select("doc_a", "doc_b").collect()
    un = {(r["doc_a"], r["doc_b"]) for r in uncapped}
    cp = {(r["doc_a"], r["doc_b"]) for r in capped}
    # uncapped: the 30-doc boilerplate group contributes C(30,2)=435 pairs
    assert len(un) >= 435
    # capped: every boilerplate bucket (size 30 > 10) is dropped, the
    # distinct-doc near-dup pair survives (its buckets are tiny)
    assert all(a >= 100 for a, _ in cp)
    assert (100, 101) in cp
    assert cp < un


def test_simhash_neardup_hot_bucket_cap(spark):
    d = _boilerplate_docs(spark)
    capped = simhash_neardup_pairs(d, max_hamming=3, max_bucket=10)
    cp = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert all(a >= 100 for a, _ in cp)  # boilerplate group excluded
    un = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_neardup_pairs(d, max_hamming=3).collect()
    }
    assert (0, 1) in un and cp < un


def test_embedding_neardup_hot_bucket_cap(spark):
    from kafka_connect_tablestore_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    # 40 identical vectors (one hot bucket in every table) + 2 distinct
    # near-dups elsewhere in space
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(40)]
    rows += [(100, [0.0, 1.0, 0.05, 0.0]), (101, [0.0, 1.0, 0.06, 0.0])]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    un = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(d, threshold=0.9, dim=4).collect()
    }
    cp = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(
            d, threshold=0.9, dim=4, max_bucket=10
        ).collect()
    }
    assert (100, 101) in cp and all(a >= 100 for a, _ in cp)
    assert (0, 1) in un and cp < un


def test_pack_and_shuffle_defaults_track_parallelism(spark):
    from kafka_connect_tablestore_spark.operators.corpus import (
        global_shuffle,
        pack_sequences,
    )

    par = spark.sparkContext.defaultParallelism
    d = spark.createDataFrame(
        [(i, f"word{i} tok tok tok") for i in range(200)],
        "doc_id long, text string",
    )
    packed = pack_sequences(d, budget=8)
    groups = {r["pack_group"] for r in packed.select("pack_group").distinct().collect()}
    assert groups <= set(range(par)) and len(groups) == min(par, 200)

    shuffled = global_shuffle(d)
    shards = {r["shard"] for r in shuffled.select("shard").distinct().collect()}
    assert shards <= set(range(par))
    # explicit values still win (determinism-critical callers)
    explicit = pack_sequences(d, budget=8, n_groups=3)
    assert {
        r["pack_group"] for r in explicit.select("pack_group").distinct().collect()
    } <= {0, 1, 2}


def test_registrable_domain_psl(spark):
    from kafka_connect_tablestore_spark.operators.corpus import url_domain_stats

    rows = [
        (1, "see https://a.co.uk/x and https://www.b.co.uk/y"),
        (2, "see https://shop.a.co.uk/z"),
        (3, "see https://x.example.com/1 and http://y.example.com/2"),
        (4, "bare http://localhost/ and https://deep.sub.site.com.au/p"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["domain"]: r["n_docs"] for r in url_domain_stats(d).collect()}
    # a.co.uk and b.co.uk are DISTINCT registrable domains (PSL branch);
    # shop.a.co.uk merges into a.co.uk; subdomains of example.com merge;
    # single-label host passes through; com.au registers at label 3
    assert got == {
        "a.co.uk": 2,
        "b.co.uk": 1,
        "example.com": 1,
        "localhost": 1,
        "site.com.au": 1,
    }


def test_unigram_perplexity_known_values(spark):
    from kafka_connect_tablestore_spark.functions.text import unigram_perplexity

    # corpus model: x:3, y:1, N=4
    d = spark.createDataFrame(
        [(1, "x x"), (2, "x y"), (3, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_perplexity(d).collect()}
    # doc1: exp(-ln(3/4)) = 4/3; doc2: exp(-(ln .75 + ln .25)/2) = sqrt(16/3)
    assert got[1]["unigram_ppl"] == round(4 / 3, 4)
    assert got[2]["unigram_ppl"] == round((16 / 3) ** 0.5, 4)
    assert got[1]["n_words"] == 2 and got[2]["n_words"] == 2
    assert 3 not in got  # wordless docs have no distribution to score

    # uniform self-corpus: ppl == vocabulary size
    u = spark.createDataFrame([(1, "a a b b")], "doc_id long, text string")
    assert unigram_perplexity(u).collect()[0]["unigram_ppl"] == 2.0


def test_cap_per_domain(spark):
    from kafka_connect_tablestore_spark.operators.corpus import cap_per_domain

    rows = [(i, f"doc {i} https://sub{i % 3}.big.com/x") for i in range(40)]
    rows += [(100, "see https://a.co.uk/y"), (101, "no url in this one")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cap_per_domain(d, max_docs=10).collect()}
    assert len(out) == 42  # every input doc classified
    big = [r for r in out.values() if r["domain"] == "big.com"]
    assert len(big) == 40 and sum(r["kept"] for r in big) == 10  # capped
    assert out[100]["domain"] == "a.co.uk" and out[100]["kept"]  # under cap
    assert out[101]["domain"] is None and out[101]["kept"]       # URL-less passes
    # deterministic under repartitioning (hash-order selection, not crawl order)
    again = {
        r["doc_id"]: r["kept"]
        for r in cap_per_domain(d.repartition(7), max_docs=10).collect()
    }
    assert again == {k: v["kept"] for k, v in out.items()}
