"""Stateful streaming: per-repo telemetry accumulates across micro-batches
via applyInPandasWithState and matches a batch groupBy of the whole log."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.sources.synth import synth_changelog
from kafka_connect_tablestore_spark.streaming.stateful import change_rate_monitor


def test_change_rate_monitor_accumulates(spark, tmp_path):
    events = synth_changelog(spark, 2000, seed=95, n_repos=12).cache()
    src = str(tmp_path / "src")
    events.where("offset < 1000").coalesce(1).write.parquet(os.path.join(src, "f0"))
    events.where("offset >= 1000").coalesce(1).write.parquet(os.path.join(src, "f1"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        change_rate_monitor(stream)
        .writeStream.format("memory")
        .queryName("telemetry")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # last update per repo (cumulative) must equal the batch aggregate
    got = {
        r["repo"]: (r["n_events"], r["n_deletes"], r["last_commit_ts"])
        for r in spark.sql(
            "SELECT repo, n_events, n_deletes, last_commit_ts FROM ("
            "SELECT *, row_number() OVER (PARTITION BY repo ORDER BY n_events DESC) rn "
            "FROM telemetry) WHERE rn = 1"
        ).collect()
    }
    want = {
        r["repo"]: (r["n"], r["d"], r["ts"])
        for r in events.groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("op") == "DELETE", 1)).alias("d"),
            F.max("commit_ts").alias("ts"),
        )
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from kafka_connect_tablestore_spark.streaming.stateful import (
        streaming_exact_dedup,
    )

    rows = [
        # (doc_id, text, event_time-second) — texts 'a' and 'b' repeat
        # across files/batches, differing only in whitespace/case
        (1, "Alpha  beta", 1),
        (2, "gamma delta", 2),
        (3, "alpha beta", 3),       # dup of 1 (normalized)
        (4, "epsilon zeta", 10),
        (5, "GAMMA   DELTA", 11),   # dup of 2
        (6, "alpha beta", 12),      # dup of 1
    ]
    df = spark.createDataFrame(
        [(i, t, s) for i, t, s in rows], "doc_id long, text string, sec long"
    ).withColumn("event_time", F.timestamp_seconds(F.col("sec"))).drop("sec")
    src = str(tmp_path / "src")
    df.where("doc_id <= 3").coalesce(1).write.parquet(os.path.join(src, "f0"))
    df.where("doc_id > 3").coalesce(1).write.parquet(os.path.join(src, "f1"))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_exact_dedup(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    kept = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM dedup_stream").collect()
    )
    # one survivor per distinct normalized text; micro-batch file order is
    # deterministic here (f0 then f1), so the earliest ids win
    assert kept == [1, 2, 4]
