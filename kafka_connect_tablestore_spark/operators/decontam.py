"""Benchmark decontamination: n-gram overlap between a training corpus and an
evaluation/benchmark set — the train-test-contamination check every
large-scale training-data pipeline runs before a corpus ships.

Construction (the standard published recipe: exact k-gram collision against
the benchmark's shingle set):

1. benchmark side → DISTINCT k-shingle hashes (the eval set is tiny next to
   the corpus: thousands of docs → at most a few 10^7 hashes, 8 bytes each —
   broadcastable; for a pathologically large benchmark drop the
   ``broadcast()`` hint and let AQE pick a shuffle join),
2. corpus side → per-doc DISTINCT shingles, exploded (map-only: explode
   fuses into the scan),
3. left join corpus shingles against the benchmark set (broadcast hash join
   — zero shuffle of the corpus), flag hits,
4. one ``groupBy(doc_id)`` shuffle — and because a doc's exploded shingles
   are partition-contiguous, map-side partial aggregation collapses them to
   ONE row per doc before the wire.

Everything is expressed on the shared md5 ``hash64`` family so the operator
has a bit-identical DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.functions.text import (
    hash64,
    shingles_from_words,
    words,
)


def benchmark_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document benchmark contamination: the fraction of the doc's
    DISTINCT k-shingles that also occur anywhere in ``benchmark``.

    Output: ``(doc_id, n_shingles, n_shared, contamination, contaminated)``
    for EVERY corpus doc — docs too short to shingle get ``n_shingles=0``,
    ``contamination=0.0`` (nothing to collide ⇒ clean)."""
    corpus_sh = (
        df.select(F.col(id_col), words(text_col).alias("_w"))
        .select(
            F.col(id_col),
            F.array_distinct(shingles_from_words(F.col("_w"), k)).alias("_sh"),
        )
        .select(F.col(id_col), F.explode_outer(F.col("_sh")).alias("_s"))
        .select(F.col(id_col), hash64(F.col("_s"), "dc").alias("_h"))
    )
    bench_sh = (
        benchmark.select(words(text_col).alias("_w"))
        .select(shingles_from_words(F.col("_w"), k).alias("_sh"))
        .select(F.explode_outer(F.col("_sh")).alias("_s"))
        .select(hash64(F.col("_s"), "dc").alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    per_doc = (
        corpus_sh.join(F.broadcast(bench_sh), "_h", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("_h")).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_shared"),
        )
    )
    # try_divide, not `/`: zero-shingle docs now reach the division (the
    # outer explode keeps them in per_doc with n_shingles=0) and ANSI mode
    # would raise DIVIDE_BY_ZERO; null ratio then coalesces to clean.
    ratio = F.try_divide(F.col("n_shared"), F.col("n_shingles"))
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
            F.round(F.coalesce(ratio, F.lit(0.0)), 4).alias("contamination"),
            F.coalesce(ratio >= threshold, F.lit(False)).alias("contaminated"),
        )
    )
