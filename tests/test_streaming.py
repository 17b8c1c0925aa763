"""Structured Streaming front-end: file-stream source → foreachBatch → engine.
Exercises S1 (source), S19 (checkpoint + idempotent manifests = exactly-once
across restarts) with the same semantics the Kafka source line would have."""

from __future__ import annotations

import os

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog
from kafka_connect_tablestore_spark.streaming.pipeline import start_cdc_stream


def test_stream_matches_batch(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 3000, seed=31).cache()
    src_dir = str(tmp_path / "src")
    # several files => several micro-batches under maxFilesPerTrigger=1.
    # coalesce(1): one file per offset slice, honoring the engine's per-key
    # in-order delivery contract (same as Kafka per-partition order).
    events.where("offset < 1000").coalesce(1).write.parquet(os.path.join(src_dir, "f0"))
    events.where("offset >= 1000 and offset < 2000").coalesce(1).write.parquet(os.path.join(src_dir, "f1"))
    events.where("offset >= 2000").coalesce(1).write.parquet(os.path.join(src_dir, "f2"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    q = start_cdc_stream(stream, eng, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    ref = CdcEngine(spark, cfg, str(tmp_path / "lake_ref"))
    ref.replay(events)
    got = {(r["repo"], r["path"], r["content_sha256"]) for r in eng.state().collect()}
    want = {(r["repo"], r["path"], r["content_sha256"]) for r in ref.state().collect()}
    assert got == want and len(got) > 0

    # restart the stream on the same checkpoint: no new data => no new version
    v = eng.table.current_version()
    q2 = start_cdc_stream(
        spark.readStream.schema(events.schema).option("maxFilesPerTrigger", 1).parquet(src_dir + "/*"),
        eng,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(300)
    assert eng.table.current_version() == v


def test_lsh_index_stream_matches_batch_recompute(spark, tmp_path):
    """Round-5 directive 4: the persisted MinHash-LSH index driven by the
    STREAMING engine (foreachBatch) across four micro-batches must land in
    exactly the state the hand-driven batch loop produces — and the union
    of per-batch emitted pairs must equal the full-corpus recompute (each
    pair emitted exactly once, by the micro-batch completing it)."""
    from kafka_connect_tablestore_spark.operators.dedup import (
        _banded_rows,
        build_lsh_index,
        minhash_lsh_pairs,
    )
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_lsh_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 400")
        .cache()
    )
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300), (300, 400)]):
        docs.where(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "lsh_idx")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_lsh_index_stream(stream, idx, pairs_out, ckpt)
    q.awaitTermination(300)

    got_pairs = {
        (r["doc_a"], r["doc_b"], r["n_match"])
        for r in spark.read.parquet(pairs_out).collect()
    }
    want_pairs = {
        (r["doc_a"], r["doc_b"], r["n_match"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert got_pairs == want_pairs and len(got_pairs) > 0

    cols = ["doc_id", "band", "band_key"] + [f"h{j}" for j in range(8)]
    got_idx = {tuple(r[c] for c in cols) for r in spark.read.parquet(idx).collect()}
    ref_idx_path = str(tmp_path / "lsh_ref")
    build_lsh_index(docs, ref_idx_path)
    want_idx = {
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(ref_idx_path).collect()
    }
    assert got_idx == want_idx

    # restart on the same checkpoint: no new data => no re-emission, no
    # index growth (manifest + checkpoint make replay a no-op)
    n_idx_rows = spark.read.parquet(idx).count()
    q2 = start_lsh_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        pairs_out,
        ckpt,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(idx).count() == n_idx_rows
    assert {
        (r["doc_a"], r["doc_b"], r["n_match"])
        for r in spark.read.parquet(pairs_out).collect()
    } == want_pairs


def test_semantic_index_stream_matches_batch_recompute(spark, tmp_path):
    """The persisted SemDeDup survivor index driven by the STREAMING engine
    across three micro-batches must equal the full-corpus batch recompute:
    union of per-batch verdict slices == semantic_dedup(all), and the index
    contents == build_semantic_index(all).  (Second stream-driven index
    after LSH — the monotone-id daily-ingest shape.)"""
    from kafka_connect_tablestore_spark.operators.similarity import (
        build_semantic_index,
        semantic_dedup,
    )
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_semantic_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    vecs = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where("vec_id < 300")
        .cache()
    )
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300)]):
        vecs.where(f"vec_id >= {lo} and vec_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "sem_idx")
    verdicts = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_semantic_index_stream(
        stream, idx, verdicts, ckpt, threshold=0.3, n_cells=16
    )
    q.awaitTermination(300)

    got = {
        (r["vec_id"], r["is_survivor"])
        for r in spark.read.parquet(verdicts).collect()
    }
    want = {
        (r["vec_id"], r["is_survivor"])
        for r in semantic_dedup(
            vecs, 0.3, 16, "vec_id", "embedding", train="first"
        ).collect()
    }
    assert got == want and len(got) == 300
    assert any(not s for _, s in got)  # some vectors actually dominated

    ref_idx = str(tmp_path / "sem_ref")
    build_semantic_index(vecs, ref_idx, 0.3, 16, train="first")
    got_ids = {r["vec_id"] for r in spark.read.parquet(idx).collect()}
    want_ids = {r["vec_id"] for r in spark.read.parquet(ref_idx).collect()}
    assert got_ids == want_ids

    # restart on the same checkpoint: no new data => no growth, no re-emit
    n_rows = spark.read.parquet(idx).count()
    q2 = start_semantic_index_stream(
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        verdicts,
        ckpt,
        threshold=0.3,
        n_cells=16,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(idx).count() == n_rows
    assert {
        (r["vec_id"], r["is_survivor"])
        for r in spark.read.parquet(verdicts).collect()
    } == want


def test_chunk_index_stream_matches_batch_recompute(spark, tmp_path):
    """The persisted chunk-fingerprint index driven by the STREAMING engine
    across three micro-batches must equal the full-corpus batch recompute:
    union of per-batch dedup slices == chunk_dedup(all), and the index ==
    build_chunk_index(all).  (Third stream-driven index after LSH and
    semantic — monotone-id daily ingest.)"""
    from kafka_connect_tablestore_spark.operators.corpus import (
        build_chunk_index,
        chunk_dedup,
    )
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_chunk_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 300")
        .cache()
    )
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300)]):
        docs.where(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "chunk_idx")
    dedup_out = str(tmp_path / "dedup")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_chunk_index_stream(stream, idx, dedup_out, ckpt, chunk_words=8)
    q.awaitTermination(300)

    cols = ["doc_id", "n_chunks", "n_kept", "clean_md5"]
    got = {
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(dedup_out).select(cols).collect()
    }
    want = {
        tuple(r[c] for c in cols)
        for r in chunk_dedup(docs, chunk_words=8).collect()
    }
    assert got == want and len(got) == 300
    # the corpus genuinely shares spans at this chunk size
    assert any(r[2] < r[1] for r in got)

    ref_idx = str(tmp_path / "chunk_ref")
    build_chunk_index(docs, ref_idx, chunk_words=8)
    key = ["chunk_md5", "doc_id", "pos"]
    got_idx = {
        tuple(r[c] for c in key) for r in spark.read.parquet(idx).collect()
    }
    want_idx = {
        tuple(r[c] for c in key) for r in spark.read.parquet(ref_idx).collect()
    }
    assert got_idx == want_idx

    # restart on the same checkpoint: no new data => no growth, no re-emit
    n_rows = spark.read.parquet(idx).count()
    q2 = start_chunk_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        dedup_out,
        ckpt,
        chunk_words=8,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(idx).count() == n_rows
    assert {
        tuple(r[c] for c in cols)
        for r in spark.read.parquet(dedup_out).select(cols).collect()
    } == want


def test_fingerprint_index_stream_matches_batch_recompute(spark, tmp_path):
    """The persisted exact-dedup fingerprint index driven by the STREAMING
    engine across three micro-batches must equal the full-corpus batch
    recompute: union of per-batch kept verdicts == dedup_exact(all), and
    the index holds exactly one row per distinct content.  (Fifth
    stream-driven index — the FIRST gate a daily crawl ingest hits.)"""
    from kafka_connect_tablestore_spark.operators.dedup import (
        build_fingerprint_index,
        dedup_exact,
    )
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_fingerprint_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    base = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 300")
    )
    # inject cross-day exact duplicates so the index genuinely fires:
    # day-2 ids 1000..1009 repeat day-0 content 0..9
    dup = base.where("doc_id < 10").selectExpr("doc_id + 1000 AS doc_id", "text")
    docs = base.unionByName(dup).cache()
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 2000)]):
        docs.where(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "fp_idx")
    verdicts_out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_fingerprint_index_stream(
        stream, idx, verdicts_out, ckpt, n_buckets=16
    )
    q.awaitTermination(300)

    verdicts = spark.read.parquet(verdicts_out)
    assert verdicts.count() == 310  # every doc got a verdict exactly once
    got_kept = {r["doc_id"] for r in verdicts.where("kept").collect()}
    want_kept = {
        r["keep_id"] for r in dedup_exact(docs).selectExpr("keep_id").collect()
    }
    assert got_kept == want_kept
    # the injected cross-day duplicates were recognized against the index
    assert all(1000 + i not in got_kept for i in range(10))

    # index == batch-built reference index (one row per distinct content)
    ref_idx = str(tmp_path / "fp_ref")
    build_fingerprint_index(docs, ref_idx, n_buckets=16)
    key = ["fp", "doc_id", "bucket"]
    got_idx = {
        tuple(r[c] for c in key) for r in spark.read.parquet(idx).collect()
    }
    want_idx = {
        tuple(r[c] for c in key) for r in spark.read.parquet(ref_idx).collect()
    }
    assert got_idx == want_idx

    # restart on the same checkpoint: no new data => no growth, no re-emit
    q2 = start_fingerprint_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        verdicts_out,
        ckpt,
        n_buckets=16,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(idx).count() == len(want_idx)
    assert spark.read.parquet(verdicts_out).count() == 310


def test_bloom_index_stream_matches_batch_recompute(spark, tmp_path):
    """The persisted Bloom bitset driven by the STREAMING engine across
    three micro-batches: each batch's verdict slice must equal the
    two-frame recompute against the union of all earlier batches (bitset
    OR is associative), and a checkpoint restart is a no-op.  (Sixth
    stream-driven index; no monotone-id precondition.)"""
    from kafka_connect_tablestore_spark.operators.dedup import bloom_dedup
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_bloom_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    base = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .where("doc_id < 300")
    )
    dup = base.where("doc_id < 10").selectExpr("doc_id + 5000 AS doc_id", "text")
    docs = base.unionByName(dup).cache()
    slices = [(0, 100), (100, 200), (200, 10000)]
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate(slices):
        docs.where(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "bloom_idx")
    verdicts_out = str(tmp_path / "verdicts")
    ckpt = str(tmp_path / "ckpt")
    q = start_bloom_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        verdicts_out,
        ckpt,
        m_bits=4096,
        k=3,
    )
    q.awaitTermination(300)

    all_v = spark.read.parquet(verdicts_out)
    assert all_v.count() == 310
    for i, (lo, hi) in enumerate(slices):
        got = {
            (r["doc_id"], r["maybe_in_prior"])
            for r in all_v.where(f"batch_id = {i}").collect()
        }
        if i == 0:
            want = {
                (r["doc_id"], False)
                for r in docs.where(f"doc_id >= {lo} and doc_id < {hi}").collect()
            }
        else:
            day = docs.where(f"doc_id >= {lo} and doc_id < {hi}")
            prior = docs.where(f"doc_id < {lo}")
            want = {
                (r["doc_id"], r["maybe_in_prior"])
                for r in bloom_dedup(day, prior, m_bits=4096, k=3).collect()
            }
        assert got == want, f"batch {i} diverged"
    flagged = {r["doc_id"] for r in all_v.where("maybe_in_prior").collect()}
    assert all(5000 + i in flagged for i in range(10))

    # restart on the same checkpoint: no re-emit, no index growth
    n_idx = spark.read.parquet(idx).count()
    q2 = start_bloom_index_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        verdicts_out,
        ckpt,
        m_bits=4096,
        k=3,
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(idx).count() == n_idx
    assert spark.read.parquet(verdicts_out).count() == 310


def test_ivf_index_stream_matches_batch_recompute(spark, tmp_path):
    """The persisted IVF inverted file driven by the STREAMING engine
    (foreachBatch) across four micro-batches: content-equal to the
    build+append batch loop, probe-equal to the in-memory ANN over the
    union, pruning intact through the extra batch_id partition level, and
    replay-idempotent WITHOUT the manifest (dynamic partition overwrite —
    a duplicated IVF row would steal a top-k rank slot, so structural
    idempotency is load-bearing here, not belt-and-braces)."""
    import json
    import re

    from pyspark.sql import functions as F

    from kafka_connect_tablestore_spark.operators.similarity import (
        ann_ivf_indexed_topk,
        ann_ivf_topk,
        append_to_ivf_index,
        build_ivf_index,
    )
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_ivf_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    vecs = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )
    src = str(tmp_path / "src")
    slices = [(0, 125), (125, 250), (250, 375), (375, 500)]
    for i, (lo, hi) in enumerate(slices):
        vecs.where(f"vec_id >= {lo} and vec_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "ivf_idx")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_ivf_index_stream(stream, idx, ckpt, n_cells=8)
    q.awaitTermination(300)

    with open(idx + ".centroids.json") as f:
        cents = json.load(f)

    def idx_rows(path):
        return {
            (r["neighbor_id"], r["cell"], r["cn"], tuple(r["cv"]))
            for r in spark.read.parquet(path).collect()
        }

    # content equality with the hand-driven batch loop over the same slices
    ref_idx = str(tmp_path / "ivf_ref")
    ref_cents = build_ivf_index(
        vecs.where("vec_id < 125"), ref_idx, n_cells=8, train="first"
    )
    assert ref_cents == cents  # monotone-id ingest => same 'first' centroids
    for lo, hi in slices[1:]:
        append_to_ivf_index(
            vecs.where(f"vec_id >= {lo} and vec_id < {hi}"), ref_idx, ref_cents
        )
    got_idx = idx_rows(idx)
    assert got_idx == idx_rows(ref_idx) and len(got_idx) == 500

    # probe equality with the in-memory ANN over the full union
    queries = vecs.where(F.col("vec_id") < 5)
    got = ann_ivf_indexed_topk(spark, idx, cents, queries, k=5, nprobe=2)
    want = ann_ivf_topk(vecs, queries, k=5, nprobe=2, n_cells=8, train="first")
    key = lambda d: {
        (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
        for r in d.collect()
    }
    assert key(got) == key(want) and len(key(got)) > 0

    # pruning survives the extra batch_id partition level
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cell" in m.group(0)

    # restart on the same checkpoint: no new data => no index change
    q2 = start_ivf_index_stream(
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        ckpt,
    )
    q2.awaitTermination(300)
    assert idx_rows(idx) == got_idx

    # full crash-replay: wipe checkpoint AND manifests (keep index +
    # centroid sidecar) — every batch re-runs and must OVERWRITE its own
    # slice, never duplicate it
    import shutil

    shutil.rmtree(ckpt)
    shutil.rmtree(idx + ".batches")
    q3 = start_ivf_index_stream(
        spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        idx,
        str(tmp_path / "ckpt2"),
        n_cells=8,
    )
    q3.awaitTermination(300)
    assert idx_rows(idx) == got_idx
    assert spark.read.parquet(idx).count() == 500


def test_ivfpq_index_stream_matches_batch_recompute(spark, tmp_path):
    """The persisted IVFADC (IVF-PQ) index driven by the STREAMING engine
    across four micro-batches: batch 0 freezes the two-level quantizer
    contract in the sidecar; the streamed index must be content-equal to
    the build+append batch loop, probe-equal to it through
    ann_ivfpq_indexed_topk, and idempotent under a full wiped-checkpoint
    re-ingest (dynamic partition overwrite — same structural argument as
    the IVF stream)."""
    import json

    from kafka_connect_tablestore_spark.operators.similarity import (
        ann_ivfpq_indexed_topk,
        append_to_ivfpq_index,
        build_ivfpq_index,
    )
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_ivfpq_index_stream,
    )

    sf = "/root/testdata/sf0.01"
    vecs = (
        spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .cache()
    )
    src = str(tmp_path / "src")
    slices = [(0, 125), (125, 250), (250, 375), (375, 500)]
    for i, (lo, hi) in enumerate(slices):
        vecs.where(f"vec_id >= {lo} and vec_id < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"day{i}")
        )

    idx = str(tmp_path / "ivfpq_idx")
    ckpt = str(tmp_path / "ckpt")

    def _stream():
        return (
            spark.readStream.schema(vecs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )

    q = start_ivfpq_index_stream(
        _stream(), idx, ckpt, n_cells=8, m=4, n_codes=16, dim=64
    )
    q.awaitTermination(300)

    with open(idx + ".meta.json") as f:
        meta = json.load(f)

    # contract equality with the one-shot batch build on day 0
    ref_idx = str(tmp_path / "ivfpq_ref")
    ref_meta = build_ivfpq_index(
        vecs.where("vec_id < 125"), ref_idx, n_cells=8, m=4, n_codes=16,
        dim=64, train="first", encode="residual",
    )
    assert ref_meta["centroids"] == meta["centroids"]
    assert ref_meta["codebooks"] == meta["codebooks"]
    for lo, hi in slices[1:]:
        append_to_ivfpq_index(
            vecs.where(f"vec_id >= {lo} and vec_id < {hi}"), ref_idx, ref_meta
        )

    def idx_rows(path):
        return {
            (r["neighbor_id"], tuple(r["codes"]), r["rn"], r["cell"])
            for r in spark.read.parquet(path).collect()
        }

    got_idx = idx_rows(idx)
    assert got_idx == idx_rows(ref_idx) and len(got_idx) == 500

    # probe equality through the shared query path
    queries = vecs.where("vec_id < 5")
    key = lambda df: {
        (r["query_id"], r["rank"], r["neighbor_id"], r["pq_cos"])
        for r in df.collect()
    }
    got = key(ann_ivfpq_indexed_topk(spark, idx, meta, queries, k=5, nprobe=2))
    want = key(
        ann_ivfpq_indexed_topk(spark, ref_idx, ref_meta, queries, k=5, nprobe=2)
    )
    assert got == want and len(got) > 0

    # full crash-replay: wipe checkpoint AND manifests (keep index + meta
    # sidecar) — every batch re-runs and must overwrite, never duplicate
    import shutil

    shutil.rmtree(ckpt)
    shutil.rmtree(idx + ".batches")
    q2 = start_ivfpq_index_stream(
        _stream(), idx, str(tmp_path / "ckpt2"), n_cells=8, m=4, n_codes=16,
        dim=64,
    )
    q2.awaitTermination(300)
    assert idx_rows(idx) == got_idx
    assert spark.read.parquet(idx).count() == 500
