"""Multi-table topic routing at the engine level (S2 + S21): two topics land
in two independent lake tables, each exactly-once; results equal per-topic
single-table runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine, MultiTableCdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def sig(df):
    return {(r["repo"], r["path"]): r["content_sha256"] for r in df.collect()}


def test_multi_table_routing(spark, tmp_path):
    cfg = SinkConfig(
        delete_mode=DeleteMode.ROW,
        topic_table_map={"alpha": "t_alpha"},
        table_name_format="tbl_<topic>",
    )
    a = synth_changelog(spark, 1500, seed=71, topic="alpha")
    b = synth_changelog(spark, 1500, seed=72, topic="beta").withColumn(
        "offset", F.col("offset") + 1_000_000
    )
    events = a.unionByName(b).cache()

    multi = MultiTableCdcEngine(spark, cfg, str(tmp_path / "multi"))
    manifests = multi.apply_batch(events, "b0")
    assert set(manifests) == {"t_alpha", "tbl_beta"}

    ref_a = CdcEngine(spark, cfg, str(tmp_path / "ra"))
    ref_a.apply_batch(a, "b0")
    ref_b = CdcEngine(spark, cfg, str(tmp_path / "rb"))
    ref_b.apply_batch(b, "b0")
    assert sig(multi.state("t_alpha")) == sig(ref_a.state())
    assert sig(multi.state("tbl_beta")) == sig(ref_b.state())

    # idempotent per-table redelivery
    m2 = multi.apply_batch(events, "b0")
    assert all(m["skipped"] for m in m2.values())


def test_multi_table_streaming_matches_batch(spark, tmp_path):
    """Routed multi-table ingest driven by a real Structured Streaming query:
    several micro-batches per table, each batch 1+ merging into a non-empty
    table INSIDE foreachBatch — the path where the merge plan must stay on
    the micro-batch's cloned session (see LakeTable._read_buckets)."""
    import os

    cfg = SinkConfig(delete_mode=DeleteMode.ROW, table_name_format="tbl_<topic>")
    a = synth_changelog(spark, 1200, seed=81, topic="alpha")
    b = synth_changelog(spark, 1200, seed=82, topic="beta").withColumn(
        "offset", F.col("offset") + 1_000_000
    )
    events = a.unionByName(b).cache()

    # slice micro-batches by offset range (parity-style slicing would break
    # the per-key in-order delivery contract)
    src = str(tmp_path / "src")
    lo_a = a.where("offset < 600")
    hi_a = a.where("offset >= 600")
    lo_b = b.where("offset < 1000600")
    hi_b = b.where("offset >= 1000600")
    lo_a.unionByName(lo_b).coalesce(1).write.parquet(os.path.join(src, "f0"))
    hi_a.unionByName(hi_b).coalesce(1).write.parquet(os.path.join(src, "f1"))

    multi = MultiTableCdcEngine(spark, cfg, str(tmp_path / "multi"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, bid: multi.apply_batch(bdf, f"stream-{bid}")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240)

    ref_a = CdcEngine(spark, cfg, str(tmp_path / "ra"))
    ref_a.apply_batch(a, "b0")
    ref_b = CdcEngine(spark, cfg, str(tmp_path / "rb"))
    ref_b.apply_batch(b, "b0")
    assert sig(multi.state("tbl_alpha")) == sig(ref_a.state())
    assert sig(multi.state("tbl_beta")) == sig(ref_b.state())
    # two micro-batches committed per table
    assert multi.engine_for("tbl_alpha").table.current_version() == 2
