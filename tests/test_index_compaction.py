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


def _stream_shaped_ivf(spark, tmp_path, batches=3, commit_all=True):
    """Write an IVF index in the STREAM layout (batch_id/cell hive dirs +
    per-batch commit manifests), without running a streaming query — the
    layout itself is what start_ivf_index_stream's own tests pin."""
    import json

    from pyspark.sql import functions as F

    from kafka_connect_tablestore_spark.operators.similarity import (
        ivf_assign,
    )

    idx = str(tmp_path / "sivf")
    vecs = _emb(spark, 0, 120).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    cents = [
        [float(x) for x in r["cv"]]
        for r in vecs.orderBy("neighbor_id").limit(4).collect()
    ]
    norm = F.sqrt(F.aggregate("cv", F.lit(0.0), lambda a, x: a + x * x))
    os.makedirs(idx + ".batches", exist_ok=True)
    for b in range(batches):
        (
            vecs.where(f"neighbor_id >= {b * 40} and neighbor_id < {b * 40 + 40}")
            .withColumn("cn", norm)
            .withColumn("cell", ivf_assign(F.col("cv"), cents))
            .withColumn("batch_id", F.lit(b))
            .write.mode("append")
            .partitionBy("batch_id", "cell")
            .parquet(idx)
        )
        if commit_all or b < batches - 1:
            with open(os.path.join(idx + ".batches", f"{b}.json"), "w") as f:
                json.dump({"batch_id": b, "n_vecs": 40}, f)
    return idx


def _rows(spark, path):
    return {
        (r["neighbor_id"], r["cell"], r["batch_id"], r["cn"], tuple(r["cv"]))
        for r in spark.read.parquet(path).collect()
    }


def test_stream_layout_compaction_preserves_batch_dirs(spark, tmp_path):
    idx = _stream_shaped_ivf(spark, tmp_path)
    before = _rows(spark, idx)
    stats = compact_index(spark, idx, INDEX_PARTITION_COLS["ivf"])
    # layout preserved: per-batch slices still exist on disk, rows equal
    assert sorted(
        d for d in os.listdir(idx) if d.startswith("batch_id=")
    ) == ["batch_id=0", "batch_id=1", "batch_id=2"]
    assert _rows(spark, idx) == before
    assert stats["rows_after"] == stats["rows_before"]
    # a resumed stream's next batch appends without a hive layout conflict
    from pyspark.sql import functions as F

    one = (
        spark.createDataFrame(
            [(999, [1.0, 0.0], 1.0, 0, 3)],
            "neighbor_id long, cv array<double>, cn double, cell int, batch_id int",
        )
    )
    one.write.mode("append").partitionBy("batch_id", "cell").parquet(idx)
    assert spark.read.parquet(idx).count() == len(before) + 1


def test_stream_layout_collapse_batches_merges_slices(spark, tmp_path):
    idx = _stream_shaped_ivf(spark, tmp_path)
    before = {(a, b, d, e) for a, b, _c, d, e in _rows(spark, idx)}
    compact_index(
        spark, idx, INDEX_PARTITION_COLS["ivf"], collapse_batches=True
    )
    dirs = sorted(d for d in os.listdir(idx) if d.startswith("batch_id="))
    assert dirs == ["batch_id=2"]  # everything under the highest batch
    after = _rows(spark, idx)
    assert {(a, b, d, e) for a, b, _c, d, e in after} == before
    assert {c for _a, _b, c, _d, _e in after} == {2}


def test_collapse_batches_refuses_uncommitted_tail(spark, tmp_path):
    import pytest

    idx = _stream_shaped_ivf(spark, tmp_path, commit_all=False)
    with pytest.raises(RuntimeError, match="no commit manifest"):
        compact_index(
            spark, idx, INDEX_PARTITION_COLS["ivf"], collapse_batches=True
        )
    # default (layout-preserving) compaction is still allowed
    before = _rows(spark, idx)
    compact_index(spark, idx, INDEX_PARTITION_COLS["ivf"])
    assert _rows(spark, idx) == before
