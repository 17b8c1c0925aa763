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
