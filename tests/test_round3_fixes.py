"""Round-3 directive coverage: auto-create readiness retry, vacuumed
time-travel errors, simhash band derivation, ngram-jaccard candidate reuse,
IVF trainer hash-gate plan shape, multimodal null-payload contract, and the
PIL-gated real pixel decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.lake.table import LakeTable
from kafka_connect_tablestore_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from kafka_connect_tablestore_spark.operators.multimodal import (
    decode_and_featurize,
    extract_image_metadata,
    synth_media,
)
from kafka_connect_tablestore_spark.operators.similarity import (
    train_ivf_centroids,
    trainer_sample_plan,
)
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

SF = "/root/testdata/sf0.001"


# ------------------------------------------- auto-create readiness retry (S17)
def test_create_waits_for_delayed_catalog_visibility(spark, tmp_path):
    """TableStoreSinkWriter.java:336-354: after auto-create, poll table
    readiness (bounded) before first use — exercised with a fake
    eventually-consistent catalog whose probe turns true on the 4th call."""
    t = LakeTable(spark, str(tmp_path), "delayed", SinkConfig())
    calls = {"n": 0}

    def probe():
        calls["n"] += 1
        return calls["n"] >= 4

    t.readiness_probe = probe
    t.CREATE_READINESS_INTERVAL_S = 0.0
    t.create_if_absent()
    assert calls["n"] == 4
    assert t.exists()


def test_create_readiness_loop_exhausts(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path), "never", SinkConfig())
    t.readiness_probe = lambda: False
    t.CREATE_READINESS_INTERVAL_S = 0.0
    t.CREATE_READINESS_RETRIES = 3
    with pytest.raises(TimeoutError, match="readiness"):
        t.create_if_absent()


# ------------------------------------------------- vacuumed version time-travel
def test_read_of_vacuumed_version_raises_descriptive_error(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    eng = CdcEngine(spark, cfg, str(tmp_path))
    events = synth_changelog(spark, 2000, seed=31).cache()
    eng.replay(events, n_batches=2)
    old_v = eng.table.current_version() - 1
    eng.table.read(version=old_v).count()  # readable before vacuum
    eng.table.compact()
    eng.table.vacuum()
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        eng.table.read(version=old_v)
    # current version still reads fine
    assert eng.table.read().count() > 0


# --------------------------------------------------- simhash band derivation
def test_simhash_neardup_rejects_undecomposable_radius(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_neardup_pairs(docs, max_hamming=16)


def test_simhash_neardup_complete_at_hamming_4(spark):
    """Band count derives from the radius (max_hamming+1 bands), so the
    pigeonhole completeness guarantee holds beyond the classic byte-banded
    radius 3 — verified exhaustively vs the brute-force pair set."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120).cache()
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs, max_hamming=4).collect()
    }
    sig = simhash(docs).cache()
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= 4)
        .collect()
    }
    assert got == brute
    docs.unpersist()
    sig.unpersist()


# --------------------------------------------- ngram-jaccard candidate reuse
def test_ngram_jaccard_accepts_precomputed_candidates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
    cand = minhash_lsh_pairs(docs)
    with_cand = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, candidates=cand).collect()
    }
    internal = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs).collect()
    }
    assert with_cand == internal and with_cand
    docs.unpersist()


# ------------------------------------------------ IVF trainer plan + determinism
def test_trainer_sample_is_filter_not_corpus_takeordered(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    plan = trainer_sample_plan(emb, max(4, n // 8))._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan  # hash gate over the corpus
    # the only TakeOrdered sits ABOVE the filter (tiny filtered set), so the
    # corpus-side scan feeds a Filter, not a per-partition top-k heap
    assert plan.index("Filter") > plan.index("TakeOrdered")


def test_trainer_sample_deterministic_under_repartitioning(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    c1 = train_ivf_centroids(emb, n_cells=4, sample_size=32)
    c2 = train_ivf_centroids(emb.repartition(7), n_cells=4, sample_size=32)
    assert c1 == c2


# --------------------------------------------------- multimodal errant payloads
def test_image_metadata_null_payload_yields_null_row(spark):
    rows = [(1, None), (2, b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + (64).to_bytes(4, "big") + (48).to_bytes(4, "big") + b"\x00" * 8)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r.asDict() for r in extract_image_metadata(df).collect()}
    assert out[1]["format"] is None and out[1]["width"] is None
    assert out[1]["n_bytes"] == 0
    assert out[2]["format"] == "png" and (out[2]["width"], out[2]["height"]) == (64, 48)


# ------------------------------------------------- new pipeline operators (r3)
def test_benchmark_overlap_semantics(spark):
    from kafka_connect_tablestore_spark.operators.decontam import benchmark_overlap

    docs = spark.read.parquet(f"{SF}/documents.parquet").cache()
    bench = docs.where(F.col("doc_id") % 31 == 0)
    out = benchmark_overlap(docs, bench).cache()
    assert out.count() == docs.count()  # every doc scored, even shingle-less
    # a benchmark member's own shingles are all in the set → contamination 1.0
    members = out.join(bench.select("doc_id"), "doc_id").where(F.col("n_shingles") > 0)
    assert members.where(F.col("contamination") != 1.0).count() == 0
    assert members.where(~F.col("contaminated")).count() == 0
    # with a tiny shared vocabulary the rest of the corpus shows PARTIAL
    # overlap — the operator is measuring something, not echoing a constant
    partial = out.where((F.col("contamination") > 0) & (F.col("contamination") < 1))
    assert partial.count() > 0
    docs.unpersist()
    out.unpersist()


def test_benchmark_overlap_broadcasts_benchmark_side(spark):
    from kafka_connect_tablestore_spark.operators.decontam import benchmark_overlap

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 31 == 0)
    plan = benchmark_overlap(docs, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles for the probe


def test_repetition_scores_known_values(spark):
    from kafka_connect_tablestore_spark.functions.text import repetition_scores

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c"), (3, "x"), (4, "go go stop go")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_frac"] == 0.75      # 1 distinct of 4
    assert out[1]["dup_2gram_frac"] == round(1 - 1 / 3, 4)  # 'a a' ×3
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["dup_2gram_frac"] == 0.0
    assert out[3]["n_words"] == 1 and out[3]["dup_2gram_frac"] == 0.0
    assert out[4]["dup_word_frac"] == 0.5       # go×3 + stop → 2 distinct of 4


def test_tfidf_topk_ranks_characteristic_terms(spark):
    from kafka_connect_tablestore_spark.functions.text import tfidf_topk

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "y z"), (3, "z z z")], "doc_id long, text string"
    )
    top1 = {
        r["doc_id"]: r["word"]
        for r in tfidf_topk(df, k=1).collect()
    }
    # x is unique to d1 (df=1) and frequent there; ties (d2: y vs z, equal
    # tf×idf) break alphabetically
    assert top1 == {1: "x", 2: "y", 3: "z"}


# ----------------------------------------------------- PIL-gated pixel decode
def test_real_decode_raises_cleanly_without_pil(spark):
    pil = pytest.importorskip("importlib.util").find_spec("PIL")
    if pil is not None:
        pytest.skip("PIL present; covered by test_real_decode_with_pil")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_and_featurize(synth_media(spark, 4), fake=False)


def test_real_decode_with_pil(spark):
    """Runs only where PIL is importable (visibly skipped otherwise): real
    pixel decode of a generated PNG — true dims + normalized histogram."""
    pytest.importorskip("PIL", reason="real pixel decode needs PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (40, 30), color=(200, 10, 10)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, "image", "image/png", len(buf.getvalue()), buf.getvalue())],
        schema=synth_media(spark, 1).schema,
    )
    row = decode_and_featurize(df, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (40, 30)
    assert abs(sum(row["feature"]) - 1.0) < 1e-6
