"""Offline compaction of the persisted incremental indexes
(operators/index_maint.py): probe results must be bit-identical before and
after, replay-duplicated rows must be removed, the file count must drop,
and the mid-swap crash states must be recoverable."""

from __future__ import annotations

import os

from kafka_connect_tablestore_spark.operators.index_maint import (
    INDEX_PARTITION_COLS,
    _data_files,
    compact_index,
    recover_compaction,
)

SF = "/root/testdata/sf0.01"


def _docs(spark, lo, hi):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .where(f"doc_id >= {lo} and doc_id < {hi}")
    )


def _emb(spark, lo, hi):
    return spark.read.parquet(f"{SF}/embeddings.parquet").where(
        f"vec_id >= {lo} and vec_id < {hi}"
    )


def test_fingerprint_compaction_preserves_probe_and_drops_replay_dupes(
    spark, tmp_path
):
    from kafka_connect_tablestore_spark.operators.dedup import (
        append_to_fingerprint_index,
        build_fingerprint_index,
        incremental_dedup_exact,
    )

    idx = str(tmp_path / "fp")
    build_fingerprint_index(_docs(spark, 0, 200), idx, n_buckets=8)
    _, kept = incremental_dedup_exact(
        spark, idx, _docs(spark, 200, 300), n_buckets=8
    )
    kept = kept.localCheckpoint(eager=True)
    append_to_fingerprint_index(kept, idx)
    # simulated crash-replay: the same batch's kept rows append AGAIN
    append_to_fingerprint_index(kept, idx)

    day2 = _docs(spark, 300, 400)
    before = {
        tuple(r)
        for r in incremental_dedup_exact(spark, idx, day2, n_buckets=8)[
            0
        ].collect()
    }
    stats = compact_index(spark, idx, INDEX_PARTITION_COLS["fingerprint"])
    after = {
        tuple(r)
        for r in incremental_dedup_exact(spark, idx, day2, n_buckets=8)[
            0
        ].collect()
    }
    assert after == before and len(after) == 100
    # the replay's exact-duplicate rows are gone, nothing else is
    assert stats["rows_after"] == stats["rows_before"] - kept.count()
    # one file per hive partition (3 appends collapsed)
    assert stats["files_after"] < stats["files_before"]
    n_parts = spark.read.parquet(idx).select("bucket").distinct().count()
    assert stats["files_after"] == n_parts


def test_fingerprint_compaction_files_per_partition_splits_layout_only(
    spark, tmp_path
):
    from kafka_connect_tablestore_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_dedup_exact,
    )

    idx = str(tmp_path / "fp")
    build_fingerprint_index(_docs(spark, 0, 300), idx, n_buckets=4)
    day = _docs(spark, 300, 400)
    before = {
        tuple(r)
        for r in incremental_dedup_exact(spark, idx, day, n_buckets=4)[
            0
        ].collect()
    }
    stats = compact_index(spark, idx, "bucket", files_per_partition=3)
    after = {
        tuple(r)
        for r in incremental_dedup_exact(spark, idx, day, n_buckets=4)[
            0
        ].collect()
    }
    assert after == before
    n_parts = spark.read.parquet(idx).select("bucket").distinct().count()
    assert n_parts < stats["files_after"] <= 3 * n_parts
    assert "_split" not in spark.read.parquet(idx).columns


def test_lsh_compaction_preserves_incremental_pairs(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.dedup import (
        append_to_lsh_index,
        build_lsh_index,
        incremental_lsh_pairs,
    )

    idx = str(tmp_path / "lsh")
    build_lsh_index(_docs(spark, 0, 200), idx)
    day1 = _docs(spark, 200, 300)
    append_to_lsh_index(day1, idx)
    append_to_lsh_index(day1, idx)  # simulated crash-replay re-append

    day2 = _docs(spark, 300, 400)
    before = {
        (r["doc_a"], r["doc_b"], r["n_match"])
        for r in incremental_lsh_pairs(spark, idx, day2).collect()
    }
    stats = compact_index(spark, idx, INDEX_PARTITION_COLS["lsh"])
    after = {
        (r["doc_a"], r["doc_b"], r["n_match"])
        for r in incremental_lsh_pairs(spark, idx, day2).collect()
    }
    assert after == before and len(after) > 0
    assert stats["rows_after"] < stats["rows_before"]
    assert stats["files_after"] < stats["files_before"]


def test_semantic_compaction_preserves_probe_verdicts(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.similarity import (
        append_to_semantic_index,
        build_semantic_index,
        incremental_semantic_dedup,
    )

    idx = str(tmp_path / "sem")
    thr = 0.3
    cents = build_semantic_index(
        _emb(spark, 0, 200), idx, threshold=thr, n_cells=8
    )
    per_vec, kept = incremental_semantic_dedup(
        spark, idx, cents, _emb(spark, 200, 300), threshold=thr
    )
    kept = kept.localCheckpoint(eager=True)
    append_to_semantic_index(kept, idx)
    append_to_semantic_index(kept, idx)  # simulated crash-replay re-append

    day2 = _emb(spark, 300, 400)
    before = {
        (r["vec_id"], r["cell"], r["is_survivor"])
        for r in incremental_semantic_dedup(
            spark, idx, cents, day2, threshold=thr
        )[0].collect()
    }
    stats = compact_index(spark, idx, INDEX_PARTITION_COLS["semantic"])
    after = {
        (r["vec_id"], r["cell"], r["is_survivor"])
        for r in incremental_semantic_dedup(
            spark, idx, cents, day2, threshold=thr
        )[0].collect()
    }
    assert after == before and len(after) == 100
    assert stats["rows_after"] == stats["rows_before"] - kept.count()


def test_ivf_compaction_preserves_topk_and_pruned_layout(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.similarity import (
        ann_ivf_indexed_topk,
        append_to_ivf_index,
        build_ivf_index,
    )

    idx = str(tmp_path / "ivf")
    corpus = _emb(spark, 0, 200)
    cents = build_ivf_index(corpus, idx, n_cells=8, train="first")
    append_to_ivf_index(_emb(spark, 200, 300), idx, cents)
    append_to_ivf_index(_emb(spark, 300, 400), idx, cents)
    queries = corpus.where("vec_id < 5")

    def topk():
        return {
            (r["query_id"], r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in ann_ivf_indexed_topk(
                spark, idx, cents, queries, k=5, nprobe=2
            ).collect()
        }

    before = topk()
    stats = compact_index(spark, idx, INDEX_PARTITION_COLS["ivf"])
    after = topk()
    assert after == before and len(after) > 0
    # append enforces disjoint ids, so no rows should have been dropped
    assert stats["rows_after"] == stats["rows_before"]
    assert stats["files_after"] < stats["files_before"]
    # the hive layout survives: cell dirs still present for pruning
    assert any(
        d.startswith("cell=") for d in os.listdir(idx) if not d.startswith("_")
    )


def test_compact_refuses_after_mid_swap_crash_and_recovery_restores(
    spark, tmp_path
):
    from kafka_connect_tablestore_spark.operators.dedup import (
        build_fingerprint_index,
        incremental_dedup_exact,
    )
    import pytest

    idx = str(tmp_path / "fp")
    build_fingerprint_index(_docs(spark, 0, 200), idx, n_buckets=4)
    day = _docs(spark, 200, 300)
    want = {
        tuple(r)
        for r in incremental_dedup_exact(spark, idx, day, n_buckets=4)[
            0
        ].collect()
    }

    # crash BETWEEN the two renames: live dir gone, .old holds the index
    os.rename(idx, idx + ".old")
    os.makedirs(idx + ".compact.tmp")
    with pytest.raises(RuntimeError, match="recover_compaction"):
        compact_index(spark, idx, "bucket")
    assert recover_compaction(idx) == "restored"
    assert not os.path.exists(idx + ".old")
    assert not os.path.exists(idx + ".compact.tmp")
    got = {
        tuple(r)
        for r in incremental_dedup_exact(spark, idx, day, n_buckets=4)[
            0
        ].collect()
    }
    assert got == want

    # crash AFTER the swap completed: live dir present, .old is leftover
    os.makedirs(idx + ".old")
    assert recover_compaction(idx) == "cleaned"
    assert not os.path.exists(idx + ".old")
    assert recover_compaction(idx) == "noop"

    # pre-swap leftover tmp alone is discarded by the next compact
    os.makedirs(idx + ".compact.tmp")
    stats = compact_index(spark, idx, "bucket")
    assert stats["rows_after"] == stats["rows_before"]
    assert len(_data_files(idx)) == stats["files_after"]
