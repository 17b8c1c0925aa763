"""Round-5 directives: cap_per_domain de-skew (salted two-phase exact
top-k), case-insensitive registrable domains, ISO-BMFF size-0 boxes,
PQ trainer input validation."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---- directive 1: cap_per_domain must not serialize a hot domain -----------

def _skewed_corpus(spark):
    # one domain holds ~90% of the corpus — the web-scale shape where a
    # single host (pinterest.com, blogspot subtree, ...) dominates a crawl
    rows = [(i, f"doc {i} https://hot.com/p/{i}") for i in range(900)]
    rows += [
        (1000 + i, f"doc https://site{i % 10}.org/x/{i}") for i in range(100)
    ]
    rows += [(5000, "no url here at all")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cap_per_domain_skew_stress_plan_is_salted(spark):
    """The hot domain must be ranked in (domain, salt) buckets first, so no
    single task ever sees the whole domain: the plan carries TWO Window
    nodes and the first one's partition spec includes the salt column."""
    from kafka_connect_tablestore_spark.operators.corpus import cap_per_domain

    d = _skewed_corpus(spark)
    out = cap_per_domain(d, max_docs=10, n_salts=8)
    plan = physical_plan(out)
    assert plan.count("windowspecdefinition") >= 2, plan
    # phase 1 partitions by (domain, _salt) — the de-skew guarantee
    assert "windowspecdefinition(domain" in plan and "_salt" in plan, plan
    salted_spec = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "_salt" in ln
    ]
    assert salted_spec, plan
    # Spark 4 pushes the rank filter into a map-side WindowGroupLimit, so
    # even the salted phase pre-thins before its shuffle — assert we keep it
    assert "WindowGroupLimit" in plan, plan


def test_cap_per_domain_skew_stress_results_exact(spark):
    """Salting never changes the answer: phase 1 keeps an exact superset of
    every domain's true top-``max_docs`` (a row's bucket-local rank lower-
    bounds its global rank), phase 2 re-ranks the bounded survivor set
    exactly.  Equal to the degenerate single-window form for any n_salts."""
    from kafka_connect_tablestore_spark.operators.corpus import cap_per_domain

    d = _skewed_corpus(spark)
    baseline = {
        r["doc_id"]: (r["domain"], r["kept"])
        for r in cap_per_domain(d, max_docs=10, n_salts=1).collect()
    }
    for n_salts in (4, 8, 33):
        got = {
            r["doc_id"]: (r["domain"], r["kept"])
            for r in cap_per_domain(d, max_docs=10, n_salts=n_salts).collect()
        }
        assert got == baseline, f"n_salts={n_salts} diverged"
    hot = [v for v in baseline.values() if v[0] == "hot.com"]
    assert len(hot) == 900 and sum(k for _, k in hot) == 10
    small = [v for v in baseline.values() if v[0] and v[0] != "hot.com"]
    assert all(k for _, k in small)          # under-cap domains pass whole
    assert baseline[5000] == (None, True)    # URL-less bypasses both windows


def test_cap_per_domain_default_salts_track_parallelism(spark):
    from kafka_connect_tablestore_spark.operators.corpus import cap_per_domain

    d = _skewed_corpus(spark)
    out = cap_per_domain(d, max_docs=10)  # default n_salts
    assert "_salt" in physical_plan(out)


# ---- directive (advice): registrable_domain is case-insensitive ------------

def test_registrable_domain_uppercase_host(spark):
    from kafka_connect_tablestore_spark.operators.corpus import url_domain_stats

    rows = [
        (1, "see https://EXAMPLE.CO.UK/x"),
        (2, "see https://example.co.uk/y"),
        (3, "see https://Other.CO.UK/z"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["domain"]: r["n_docs"] for r in url_domain_stats(d).collect()}
    # EXAMPLE.CO.UK lowercases into example.co.uk (NOT a bogus 'CO.UK'
    # merge-all); Other.CO.UK stays a distinct registrable domain
    assert got == {"example.co.uk": 2, "other.co.uk": 1}


# ---- directive (advice): ISO-BMFF size==0 = "to end of file" ---------------

def _box(btype: bytes, payload: bytes, size: int | None = None) -> bytes:
    return struct.pack(">I", 8 + len(payload) if size is None else size) + btype + payload


def test_mp4_final_moov_with_size_zero_parses(spark):
    """A final top-level box may carry size=0 ("extends to end of file").
    When that box is the moov itself — the moov-at-end layout — the walker
    previously aborted and returned None; it must span to the buffer end
    and parse."""
    from kafka_connect_tablestore_spark.operators.multimodal import (
        mp4_metadata_from_header,
    )

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat = _box(b"mdat", b"\x00" * 16)
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 600, 1200) + b"\x00" * 80,
    )
    moov0 = _box(b"moov", mvhd, size=0)  # size=0: spans to end of buffer
    m = mp4_metadata_from_header(ftyp + mdat + moov0)
    assert m is not None and m["timescale"] == 600
    assert abs(m["duration_s"] - 2.0) < 1e-9
    # size-0 mdat BEFORE moov: spec-invalid (nothing may follow a size-0
    # box) — must not crash, must return None, not garbage
    mdat0 = _box(b"mdat", b"\x00" * 16, size=0)
    assert mp4_metadata_from_header(ftyp + mdat0 + _box(b"moov", mvhd)) is None


# ---- directive 7: greedy-fixpoint chain-depth telemetry --------------------

def _unit_chain(spark, degrees):
    import math

    rows = [
        (i, [math.cos(math.radians(a)), math.sin(math.radians(a))])
        for i, a in enumerate(degrees)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_reports_rounds_executed(spark):
    """A 4-link dominance chain a-b-c-d (25-degree steps at threshold 0.9:
    neighbors cos≈0.906 >= t, skips cos≈0.64 < t) resolves in exactly 2
    source-elimination rounds (round 1: a confirmed, b killed; round 2: c
    confirmed, d killed) — and the telemetry must say so."""
    from kafka_connect_tablestore_spark.operators.similarity import (
        last_semantic_dedup_stats,
        semantic_dedup,
    )

    d = _unit_chain(spark, [0, 25, 50, 75])
    out = {
        r["vec_id"]: r["is_survivor"]
        for r in semantic_dedup(d, threshold=0.9, n_cells=1).collect()
    }
    assert out == {0: True, 1: False, 2: True, 3: False}
    stats = last_semantic_dedup_stats()
    assert stats == {
        "mode": "greedy",
        "rounds_executed": 2,
        "max_iter": 50,
        "converged": True,
        "headroom": 0.96,
    }


def test_semantic_dedup_stats_on_nonconvergence_and_dominance(spark):
    from kafka_connect_tablestore_spark.operators.clustering import (
        ConvergenceError,
    )
    from kafka_connect_tablestore_spark.operators.similarity import (
        last_semantic_dedup_stats,
        semantic_dedup,
    )

    d = _unit_chain(spark, [0, 25, 50, 75])
    with pytest.raises(ConvergenceError):
        semantic_dedup(d, threshold=0.9, n_cells=1, max_iter=1)
    stats = last_semantic_dedup_stats()
    # the failed run's depth is on record: headroom hit 0 before converging
    assert stats["converged"] is False and stats["rounds_executed"] == 1
    assert stats["headroom"] == 0.0

    semantic_dedup(d, threshold=0.9, n_cells=1, mode="dominance").collect()
    stats = last_semantic_dedup_stats()
    assert stats["mode"] == "dominance" and stats["rounds_executed"] == 0
    assert stats["converged"] is True


# ---- directive 8: PQ codes stable across identical kmeans rebuilds ---------

def test_pq_kmeans_codes_stable_across_rebuilds(spark):
    """Codebooks from train='kmeans' depend on the hash-ranked sample and
    farthest-first + Lloyd iterations — all deterministic, so two identical
    builds (and a repartitioned input) must produce byte-equal codebooks
    and identical per-vector codes."""
    import random

    from kafka_connect_tablestore_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    rng = random.Random(55)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb1 = train_pq_codebooks(d, m=2, n_codes=8, dim=8, train="kmeans")
    cb2 = train_pq_codebooks(d.repartition(13), m=2, n_codes=8, dim=8,
                             train="kmeans")
    assert cb1 == cb2
    codes1 = {
        r["vec_id"]: r["code"]
        for r in d.select(
            "vec_id", pq_encode("embedding", cb1).alias("code")
        ).collect()
    }
    codes2 = {
        r["vec_id"]: r["code"]
        for r in d.repartition(7).select(
            "vec_id", pq_encode("embedding", cb2).alias("code")
        ).collect()
    }
    assert codes1 == codes2


# ---- directive (advice): PQ trainer rejects short vectors ------------------

def test_train_pq_first_rejects_short_vectors(spark):
    from kafka_connect_tablestore_spark.operators.similarity import (
        train_pq_codebooks,
    )

    rows = [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0])]  # id 2 too short
    d = spark.createDataFrame(rows, "id long, emb array<float>")
    with pytest.raises(ValueError, match="shorter than dim"):
        train_pq_codebooks(d, dim=4, m=2, n_codes=2, train="first",
                           vec_col="emb", id_col="id")


# ---- round-5 additions: bigram LM + quality-aware canonical dedup ----------

def test_bigram_perplexity_known_values(spark):
    from kafka_connect_tablestore_spark.functions.text import bigram_perplexity

    d = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat sat"), (3, "zq"), (4, None)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_perplexity(d).collect()}
    # corpus: N=10 tokens; cu: the=3 cat=2 sat=2 on=1 mat=1 zq=1
    # cb: (the,cat)=2 (cat,sat)=2 (sat,on)=1 (on,the)=1 (the,mat)=1
    # c1: the=3 cat=2 sat=1 on=1
    import math

    def p(cb, c1, cu):
        return 0.75 * (cb / c1) + 0.25 * (cu / 10.0)

    t2 = [p(2, 3, 2), p(2, 2, 2)]  # (the,cat), (cat,sat)
    want2 = round(math.exp(-sum(math.log(x) for x in t2) / 2), 4)
    assert got[2]["bigram_ppl"] == want2
    assert got[2]["n_bigrams"] == 2
    t1 = [p(2, 3, 2), p(2, 2, 2), p(1, 1, 1), p(1, 1, 3), p(1, 3, 1)]
    want1 = round(math.exp(-sum(math.log(x) for x in t1) / 5), 4)
    assert got[1]["bigram_ppl"] == want1 and got[1]["n_bigrams"] == 5
    assert 3 not in got and 4 not in got  # <2 words: no transitions

    # deterministic under repartitioning
    again = {
        r["doc_id"]: r["bigram_ppl"]
        for r in bigram_perplexity(d.repartition(7)).collect()
    }
    assert again == {k: v["bigram_ppl"] for k, v in got.items()}


def test_canonical_docs_keeps_highest_quality(spark):
    from kafka_connect_tablestore_spark.functions.text import alpha_ratio
    from kafka_connect_tablestore_spark.operators.clustering import canonical_docs

    base = "alpha beta gamma delta epsilon zeta eta theta"
    d = spark.createDataFrame(
        [
            (1, base),                 # near-dup cluster {1,2,3}
            (2, base),                 # tie quality with 1 -> min id wins
            (3, base + " !!!"),        # dirtier variant, lower alpha ratio
            (4, "wholly different text about unrelated matters entirely"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in canonical_docs(
        d, alpha_ratio("text"), jaccard_threshold=0.5
    ).collect()}
    assert len(out) == 4  # every doc classified
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"]
    assert out[1]["is_canonical"]          # tie (q1 == q2) broken to min id
    assert not out[2]["is_canonical"] and not out[3]["is_canonical"]
    assert out[3]["quality"] < out[1]["quality"]
    assert out[4]["is_canonical"]          # singleton is its own canonical

    # the min-id doc is NOT the survivor when a higher-quality variant exists
    out2 = {r["doc_id"]: r for r in canonical_docs(
        d, F.when(F.col("doc_id") == 2, 1.0).otherwise(0.5),
        jaccard_threshold=0.5,
    ).collect()}
    assert out2[2]["is_canonical"] and not out2[1]["is_canonical"]
