"""Round-2 fixes: commit ordering in the observed path, DLQ key from config,
table-identity validation (ParamChecker port), CC convergence guard, LSH
cache lifecycle.

Reference anchors: ``TableStoreSinkTask.java:118-121`` (errants reported and
the task failed BEFORE offsets commit), ``utils/ParamChecker.java:41-97``
(existing-table validation), ``errors/TableStoreReporter.java:243-270``
(DLQ key layout).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    InsertMode,
    RuntimeErrorTolerance,
    SinkConfig,
)
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.lake.table import TableValidationError, check_table
from kafka_connect_tablestore_spark.operators.clustering import (
    ConvergenceError,
    connected_components,
)
from kafka_connect_tablestore_spark.operators.rowchange import ToleranceError, dlq_rows
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

ATTRS = ("commit", "lang", "content")

# update-mode + delete.mode=none ⇒ tombstones are dirty records (errants)
ERRANT_CFG = dict(insert_mode=InsertMode.UPDATE, delete_mode=DeleteMode.NONE)


# --------------------------------------------------------- observed-path order
def test_observed_tolerance_none_aborts_commit(spark, tmp_path):
    """tolerance=NONE + errants in the observed (single-job) path must raise
    BEFORE the snapshot pointer swap: no batch may ever be visible."""
    cfg = SinkConfig(
        **ERRANT_CFG,
        tolerance=RuntimeErrorTolerance.NONE,
        lineage_per_partition=False,
    )
    events = synth_changelog(spark, 1500, seed=11)
    assert events.where(F.col("op") == "DELETE").count() > 0  # errants exist
    eng = CdcEngine(spark, cfg, str(tmp_path))
    with pytest.raises(ToleranceError):
        eng.apply_batch(events, "b-0")
    # the commit was aborted: nothing visible, batch not marked committed
    assert eng.table.committed_batches() == {}
    assert eng.state().count() == 0
    # the same batch replays cleanly under tolerance=ALL (orphan files only)
    cfg2 = SinkConfig(
        **ERRANT_CFG,
        tolerance=RuntimeErrorTolerance.ALL,
        lineage_per_partition=False,
    )
    eng2 = CdcEngine(spark, cfg2, str(tmp_path))
    m = eng2.apply_batch(events, "b-0")
    assert not m["skipped"]


def test_observed_dlq_written_before_commit_and_lineage_in_manifest(spark, tmp_path):
    cfg = SinkConfig(
        **ERRANT_CFG,
        tolerance=RuntimeErrorTolerance.ALL,
        lineage_per_partition=False,
    )
    events = synth_changelog(spark, 1500, seed=12)
    n_tomb = events.where(F.col("op") == "DELETE").count()
    eng = CdcEngine(spark, cfg, str(tmp_path))
    m = eng.apply_batch(events, "b-0")
    # observed lineage rides the committed manifest itself (no sidecar racing
    # the commit), and the DLQ holds every tombstone
    persisted = eng.table.committed_batches()["b-0"]
    assert persisted["partitions"]["_global"]["errant_rows"] == n_tomb
    assert m["partitions"]["_global"]["errant_rows"] == n_tomb
    assert eng.table.read_dlq().count() == n_tomb


# ------------------------------------------------------------- DLQ key layout
def test_dlq_key_uses_configured_pk(spark):
    cfg = SinkConfig(pk_fields=("tenant", "item"), pk_types=("string", "long"))
    errant = spark.createDataFrame(
        [("t", 0, 7, "acme", 42, "boom", "TYPE_MISMATCH")],
        "topic string, partition int, offset long, tenant string, item long, "
        "payload string, error_info string",
    )
    row = dlq_rows(errant, cfg).first()
    assert row["topic_partition"] == "t_0"
    assert b'"tenant":"acme"' in row["key"]
    assert b'"item":42' in row["key"]


# ------------------------------------------------- ParamChecker accept/reject
def test_check_table_matrix(spark, tmp_path):
    base = SinkConfig()
    meta = {
        "pk_fields": list(base.pk_fields),
        "pk_types": list(base.pk_types),
        "n_buckets": base.n_buckets,
        "schema": {"commit": "string"},
    }
    check_table(meta, base, ATTRS)  # identical config accepted

    with pytest.raises(TableValidationError, match="primary-key names"):
        check_table(meta, SinkConfig(pk_fields=("repo", "file"), pk_types=("string", "string")), ATTRS)
    with pytest.raises(TableValidationError, match="primary-key types"):
        check_table(meta, SinkConfig(pk_types=("string", "long")), ATTRS)
    with pytest.raises(TableValidationError, match="bucket count"):
        check_table(meta, SinkConfig(n_buckets=16), ATTRS)
    with pytest.raises(TableValidationError, match="collides"):
        check_table(meta, base, ("repo", "content"))  # attr named like a PK


def test_reopen_with_conflicting_config_rejected(spark, tmp_path):
    events = synth_changelog(spark, 500, seed=13)
    eng = CdcEngine(spark, SinkConfig(n_buckets=8), str(tmp_path))
    eng.apply_batch(events, "b-0")
    # a different bucket count would hash keys into different buckets and
    # silently leave stale rows in buckets a merge no longer touches
    with pytest.raises(TableValidationError, match="bucket count"):
        CdcEngine(spark, SinkConfig(n_buckets=32), str(tmp_path))
    # same config reopens fine
    eng2 = CdcEngine(spark, SinkConfig(n_buckets=8), str(tmp_path))
    assert "b-0" in eng2.table.committed_batches()


# --------------------------------------------------------- CC convergence gate
def test_cc_raises_when_chain_exceeds_max_iter(spark):
    n = 12  # a 12-vertex path needs ~n rounds; budget of 2 must fail loudly
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    with pytest.raises(ConvergenceError):
        connected_components(ids, pairs, max_iter=2)
    # strict=False returns partial labels instead (caller-owned risk)
    partial = connected_components(ids, pairs, max_iter=2, strict=False)
    assert partial.count() == n
    # and the full budget converges to a single cluster
    full = connected_components(ids, pairs, max_iter=20)
    assert full.select("cluster_id").distinct().count() == 1


# ---------------------------------------------------------- LSH cache hygiene
def test_lsh_pairs_releases_signature_cache(spark):
    from kafka_connect_tablestore_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = spark.sparkContext._jsc.getPersistentRDDs().size()
    pairs = minhash_lsh_pairs(docs, "text", "doc_id", n_hashes=8, bands=4)
    assert pairs.count() >= 0
    # only the localCheckpoint of the (small) pair set may remain; the
    # md5-heavy signature cache must be unpersisted before return
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= n0 + 1
