"""Round-6 optimization harness (guide §1: measure first; §1.4 noop sink).

NOT part of the driver contract — ``bench.py`` stays frozen.  This file
exists to answer, per registry query: where does the wall time go?

Per query it reports:
  build_s   — time to construct the DataFrame plan (driver-side py4j +
              analysis + any eager trainer collects / localCheckpoints)
  run1_s    — first noop-sink execution (codegen/JIT cold)
  run_best  — best of the remaining executions (steady state)
  jobs      — Spark jobs triggered during build+first-run (scheduler
              fixed cost ~50-300 ms each at sf0.1 — a first-order term)

Usage:
  python bench_extra.py [query ...]        # default: the r5 top offenders
  SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS respected like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "pipe_ann_ivfpq",
    "pipe_graph_rank",
    "pipe_knn_graph",
    "pipe_semantic_dedup",
    "pipe_repetition_full",
    "pipe_lang_ngram",
    "pipe_ann_lsh",
    "pipe_embedding_neardup",
    "pipe_canonical_docs",
    "pipe_ann_lsh_probe",
    "pipe_ann_pq",
    "pipe_dup_spans",
    "pipe_neardup_clusters",
    "pipe_ann_recall",
    "pipe_ann_ivf",
    "pipe_cross_neardup",
    "pipe_winnowing_overlap",
]


def main() -> None:
    from bench import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("SPARK_GRAFT_EXTRA_RUNS", "3"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    q = em.queries()
    names = sys.argv[1:] or DEFAULT
    if names == ["ALL"]:
        names = sorted(q)
    tracker = spark.sparkContext.statusTracker()
    out = {}
    for name in names:
        if name not in q:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        df = q[name](spark, sf_dir)
        build_s = time.time() - t0
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        run1 = time.time() - t0
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        best = float("inf")
        for _ in range(runs - 1):
            t0 = time.time()
            df2 = q[name](spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        out[name] = {
            "build_s": round(build_s, 3),
            "run1_s": round(run1, 3),
            "warm_best_s": round(best, 3) if best < float("inf") else None,
            "jobs_cold": jobs1 - jobs0,
        }
        print(name, json.dumps(out[name]), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
