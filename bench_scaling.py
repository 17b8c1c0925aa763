"""Scaling-efficiency evidence (BASELINE.json north rule).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N executors;
this sandbox has no cluster, so (per the task instructions) we run the
IDENTICAL ingest job at two parallelism levels — ``local[8]`` and
``local[32]`` — on the same input and report throughput at both plus
efficiency = (T_32 / T_8) / 4.

Each level runs in a fresh subprocess (its own JVM) so neither run inherits
the other's warmed executor state; within each JVM a warm-up batch removes
JIT noise (steady-state throughput is what a long-running ingest sees).

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
from bench import build_spark, bench_cdc_ingest

cpus = int(sys.argv[1]); n_events = int(sys.argv[2])
spark = build_spark(cpus)
spark.sparkContext.setLogLevel("ERROR")
workdir = tempfile.mkdtemp(prefix=f"kcts-scale-{{cpus}}-")
try:
    eps, secs = bench_cdc_ingest(spark, n_events, workdir)
    print("RESULT " + json.dumps({{"cpus": cpus, "events_per_sec": eps, "secs": secs}}))
finally:
    shutil.rmtree(workdir, ignore_errors=True)
"""


def run_level(repo: str, cpus: int, n_events: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=repo), str(cpus), str(n_events)],
        capture_output=True,
        text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no result for local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    # 8M events: large enough that the ~1.5-2s serial floor per batch
    # (driver planning + stage scheduling + snapshot commit) is amortized —
    # at 1-2M the serial fraction caps measurable efficiency around 0.5
    n_events = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "8000000"))
    lo = run_level(repo, 8, n_events)
    hi = run_level(repo, 32, n_events)
    eff = (hi["events_per_sec"] / lo["events_per_sec"]) / 4.0
    result = {
        "metric": "throughput scaling efficiency, local[8] -> local[32] (N -> 4N stand-in)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "n_events": n_events,
        "local8_events_per_sec": round(lo["events_per_sec"], 1),
        "local32_events_per_sec": round(hi["events_per_sec"], 1),
        "local8_secs": round(lo["secs"], 2),
        "local32_secs": round(hi["secs"], 2),
    }
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH — measured baseline and scaling evidence\n\n"
            "Target metric (BASELINE.json): change-events/sec end-to-end "
            "(log tail → lake upsert committed), with throughput scaling "
            "efficiency ≥ 0.8 from N to 4N executors.  No real cluster exists "
            "in this sandbox, so per the task instructions the same ingest job "
            "runs at two local parallelism levels on the same input "
            "(fresh JVM per level, warm-up batch excluded from timing).\n\n"
            f"Input: {n_events:,} synthetic change events "
            "(deterministic generator, seed 42, Zipf-skewed repos — "
            "`kafka_connect_tablestore_spark/sources/synth.py`), "
            "pre-materialized to parquet; timed section = read log → "
            "validate/classify → fold/MERGE → bucketed snapshot commit.\n\n"
            "| parallelism | wall (s) | throughput (events/s) |\n"
            "|---|---|---|\n"
            f"| local[8]  (N)  | {result['local8_secs']} | {result['local8_events_per_sec']:,} |\n"
            f"| local[32] (4N) | {result['local32_secs']} | {result['local32_events_per_sec']:,} |\n\n"
            f"**Scaling efficiency (T_4N / T_N) / 4 = {result['value']}** "
            f"({'meets' if result['value'] >= 0.8 else 'BELOW'} the ≥ 0.8 target).\n\n"
            "Caveats: local mode shares one JVM heap and one disk for shuffle, "
            "so 4x threads contend for memory bandwidth that 4x real executors "
            "would not; the measured efficiency is therefore a lower bound on "
            "cluster behavior for this shuffle-light pipeline (two shuffles per "
            "batch: fold groupBy(pk) with map-side partial aggregation, and the "
            "bucket repartition before the write).\n\n"
            "Reproduce: `python bench_scaling.py` (env: SPARK_GRAFT_BENCH_EVENTS).\n"
            "Per-query times at sf0.1: `python bench.py` → one JSON line.\n"
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
