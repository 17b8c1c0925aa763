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
