"""Round-4 directive 7: every persisted incremental index (MinHash-LSH,
chunk, IVF) driven through THREE sequential append/probe cycles, asserting
equality with the full batch recompute after each cycle — the daily-ingest
contract, not just the single-append case the round-3 tests covered."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

#: day-0 corpus + three daily batches (monotone ids — the documented
#: incremental precondition)
SLICES = [(0, 200), (200, 300), (300, 400), (400, 500)]


def _docs(spark, lo, hi):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .where(f"doc_id >= {lo} and doc_id < {hi}")
    )


def test_lsh_index_three_day_cycle(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.dedup import (
        append_to_lsh_index,
        build_lsh_index,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )

    idx = str(tmp_path / "lsh")
    corpus = _docs(spark, *SLICES[0])
    build_lsh_index(corpus, idx)
    seen = corpus
    any_pairs = False
    for lo, hi in SLICES[1:]:
        day = _docs(spark, lo, hi)
        got = {
            (r["doc_a"], r["doc_b"], r["n_match"])
            for r in incremental_lsh_pairs(spark, idx, day).collect()
        }
        union = seen.unionByName(day)
        day_ids = set(range(lo, hi))
        want = {
            (r["doc_a"], r["doc_b"], r["n_match"])
            for r in minhash_lsh_pairs(union).collect()
            if r["doc_a"] in day_ids or r["doc_b"] in day_ids
        }
        assert got == want
        any_pairs = any_pairs or bool(got)
        append_to_lsh_index(day, idx)
        seen = union
    assert any_pairs  # the cycle exercised real candidates, not vacuity


def test_chunk_index_three_day_cycle(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.corpus import (
        append_to_chunk_index,
        build_chunk_index,
        chunk_dedup,
        incremental_chunk_dedup,
    )

    idx = str(tmp_path / "chunks")
    corpus = _docs(spark, *SLICES[0])
    build_chunk_index(corpus, idx, chunk_words=3, n_buckets=8)
    seen = corpus
    for lo, hi in SLICES[1:]:
        day = _docs(spark, lo, hi)
        per_doc, kept = incremental_chunk_dedup(
            spark, idx, day, chunk_words=3, n_buckets=8
        )
        got = {
            (r["doc_id"], r["n_chunks"], r["n_kept"], r["clean_md5"])
            for r in per_doc.collect()
        }
        union = seen.unionByName(day)
        want = {
            (r["doc_id"], r["n_chunks"], r["n_kept"], r["clean_md5"])
            for r in chunk_dedup(union, chunk_words=3).collect()
            if lo <= r["doc_id"] < hi
        }
        assert got == want and len(got) == hi - lo
        append_to_chunk_index(kept, idx)
        seen = union


def test_ivf_index_three_day_cycle(spark, tmp_path):
    """Appends reuse the index's build-time centroids; with train='first'
    and monotone ids the full-rebuild centroids of every union equal the
    day-0 centroids, so indexed top-k must match the in-memory operator on
    the union after every cycle."""
    from kafka_connect_tablestore_spark.operators.similarity import (
        ann_ivf_indexed_topk,
        ann_ivf_topk,
        append_to_ivf_index,
        build_ivf_index,
    )

    def _emb(lo, hi):
        return (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .where(f"vec_id >= {lo} and vec_id < {hi}")
        )

    idx = str(tmp_path / "ivf")
    corpus = _emb(*SLICES[0])
    cents = build_ivf_index(corpus, idx, n_cells=8, train="first")
    queries = corpus.where("vec_id < 5")
    seen = corpus
    for lo, hi in SLICES[1:]:
        day = _emb(lo, hi)
        append_to_ivf_index(day, idx, cents)
        seen = seen.unionByName(day)
        got = {
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in ann_ivf_indexed_topk(
                spark, idx, cents, queries, k=5, nprobe=2
            ).collect()
        }
        want = {
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in ann_ivf_topk(
                seen, queries, k=5, nprobe=2, n_cells=8, train="first"
            ).collect()
        }
        assert got == want and len(got) > 0


def test_semantic_index_three_day_cycle(spark, tmp_path):
    """Greedy semantic dedup is prefix-stable under monotone ids, so the
    survivor-index probe must equal the full batch recompute restricted to
    each day's new vectors, after every append cycle."""
    from kafka_connect_tablestore_spark.operators.similarity import (
        append_to_semantic_index,
        build_semantic_index,
        incremental_semantic_dedup,
        semantic_dedup,
    )

    def _emb(lo, hi):
        return (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .where(f"vec_id >= {lo} and vec_id < {hi}")
        )

    idx = str(tmp_path / "sem")
    thr, n_cells = 0.3, 8
    corpus = _emb(*SLICES[0])
    cents = build_semantic_index(corpus, idx, threshold=thr, n_cells=n_cells)
    seen = corpus
    any_dropped = False
    for lo, hi in SLICES[1:]:
        day = _emb(lo, hi)
        per_vec, kept = incremental_semantic_dedup(
            spark, idx, cents, day, threshold=thr
        )
        got = {
            (r["vec_id"], r["cell"], r["is_survivor"]) for r in per_vec.collect()
        }
        union = seen.unionByName(day)
        want = {
            (r["vec_id"], r["cell"], r["is_survivor"])
            for r in semantic_dedup(
                union, threshold=thr, n_cells=n_cells
            ).collect()
            if lo <= r["vec_id"] < hi
        }
        assert got == want and len(got) == hi - lo
        any_dropped = any_dropped or any(not s for _, _, s in got)
        append_to_semantic_index(kept, idx)
        seen = union
    assert any_dropped  # the cycles exercised real dominance, not vacuity


def test_semantic_probe_prunes_index_partitions(spark, tmp_path):
    """The incremental probe's index scan must be partition-pruned to the
    batch's cells (same mechanism the IVF probe asserts): with a batch
    confined to a few cells, the scan plan carries a cell partition filter."""
    from kafka_connect_tablestore_spark.operators.similarity import (
        build_semantic_index,
        ivf_assign,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = str(tmp_path / "semprune")
    cents = build_semantic_index(
        emb.where("vec_id < 300"), idx, threshold=0.3, n_cells=8
    )
    batch = emb.where("vec_id >= 300 and vec_id < 310")
    cells = sorted(
        r["c"]
        for r in batch.select(
            ivf_assign(F.col("embedding"), cents).alias("c")
        ).distinct().collect()
    )
    probed = spark.read.parquet(idx).where(F.col("cell").isin(cells))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert m and "cell" in m.group(0)


def test_ivfpq_index_three_day_cycle(spark, tmp_path):
    """The IVFADC index through three append/probe cycles: appends encode
    under the index's FROZEN contract (build-time centroids AND codebooks);
    with train='first' and monotone ids the union-rebuild would train the
    identical contract (both 'first' samples live in day 0), so the
    incrementally-grown index must probe-match the one-shot in-memory
    operator on the union after every cycle."""
    from kafka_connect_tablestore_spark.operators.similarity import (
        ann_ivfpq_indexed_topk,
        ann_ivfpq_topk,
        append_to_ivfpq_index,
        build_ivfpq_index,
    )

    def _emb(lo, hi):
        return (
            spark.read.parquet(f"{SF}/embeddings.parquet")
            .where(f"vec_id >= {lo} and vec_id < {hi}")
        )

    idx = str(tmp_path / "ivfpq")
    corpus = _emb(*SLICES[0])
    meta = build_ivfpq_index(
        corpus, idx, n_cells=8, m=4, n_codes=16, dim=64, train="first",
        encode="residual",
    )
    queries = corpus.where("vec_id < 5")
    seen = corpus
    key = lambda rows: {
        (r["query_id"], r["rank"], r["neighbor_id"], r["pq_cos"]) for r in rows
    }
    for lo, hi in SLICES[1:]:
        day = _emb(lo, hi)
        append_to_ivfpq_index(day, idx, meta)
        seen = seen.unionByName(day)
        got = key(
            ann_ivfpq_indexed_topk(
                spark, idx, meta, queries, k=5, nprobe=2
            ).collect()
        )
        want = key(
            ann_ivfpq_topk(
                seen, queries, k=5, nprobe=2, n_cells=8, m=4, n_codes=16,
                dim=64, train="first", encode="residual",
            ).collect()
        )
        assert got == want and len(got) > 0


def test_ivf_and_ivfpq_appends_reject_overlapping_ids(spark, tmp_path):
    """The probe paths rank without a pair-dedup shuffle because ids are
    unique by contract — so the append paths must ENFORCE disjointness,
    not just document it (a duplicated id would silently displace a true
    neighbor from top-k)."""
    import pytest

    from kafka_connect_tablestore_spark.operators.similarity import (
        append_to_ivf_index,
        append_to_ivfpq_index,
        build_ivf_index,
        build_ivfpq_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = emb.where(F.col("vec_id") < 40)
    batch = emb.where(
        (F.col("vec_id") >= 35) & (F.col("vec_id") < 45)
    )  # ids 35-39 overlap the index

    ivf_idx = str(tmp_path / "ivf_guard")
    cents = build_ivf_index(df, ivf_idx, n_cells=4, train="first")
    with pytest.raises(ValueError, match="id-disjoint"):
        append_to_ivf_index(batch, ivf_idx, cents)
    # a disjoint batch passes the default check
    append_to_ivf_index(batch.where(F.col("vec_id") >= 40), ivf_idx, cents)
    # the opt-out is explicit (for callers with upstream id allocation)
    append_to_ivf_index(
        batch.where(F.col("vec_id") >= 40), ivf_idx, cents, validate_ids=False
    )

    pq_idx = str(tmp_path / "ivfpq_guard")
    meta = build_ivfpq_index(
        df, pq_idx, n_cells=4, m=4, n_codes=8, dim=16, train="first",
    )
    with pytest.raises(ValueError, match="id-disjoint"):
        append_to_ivfpq_index(batch, pq_idx, meta)
    append_to_ivfpq_index(batch.where(F.col("vec_id") >= 40), pq_idx, meta)
