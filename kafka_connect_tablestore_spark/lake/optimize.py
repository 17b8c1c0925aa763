"""File-layout optimization for analytic tables: Z-order (Morton-curve)
clustering for multi-column data skipping.

At 100 TB a predicate like ``domain = X AND day = Y`` touches a tiny
fraction of rows, but parquet min/max skipping only helps if rows that are
close in *key space* are close in *file space*.  A single-column sort gives
that for one column and destroys it for the others; interleaving the bits
of per-column RANK buckets (the Morton / Z curve) gives every indexed
column locality at once — the same layout strategy Delta Lake's
``OPTIMIZE ZORDER BY`` and Iceberg's sort-order rewrite apply, rebuilt
here on public PySpark primitives.

Design choices, scale-first:

* **Rank buckets, not linear scaling.**  Each column is bucketed by its
  empirical quantiles (``approxQuantile`` — one pass, Greenwald-Khanna,
  driver payload = ``2^bits`` doubles per column), so a Zipf-skewed column
  still spreads across all buckets.  Linear min/max scaling would collapse
  a heavy-hitter column into one bucket and zero its skipping power.
* **The bucket lookup is a codegen'd comparison count** —
  ``size(filter(boundaries, b -> b <= v))`` over a ``2^bits``-element
  literal array: O(64) integer compares per row per column at the default
  ``bits=6``, no join, no Python, no shuffle.
* **One range shuffle total.**  The z-value is a pure per-row expression;
  ``repartitionByRange(n_files, z)`` + ``sortWithinPartitions(z)`` is the
  single exchange, and range partitioning keeps output files equal-sized
  regardless of key skew (quantile buckets make z near-uniform).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank_bucket(col: Column, boundaries: list[float]) -> Column:
    """0-based quantile-bucket index: count of boundaries ≤ value.
    NULLs land in bucket 0 (sort first, cluster together)."""
    b = F.lit([float(x) for x in boundaries])
    n = F.size(F.filter(b, lambda x: x <= col.cast("double")))
    return F.when(col.isNull(), F.lit(0)).otherwise(n)


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton z-value: bit ``b`` of column ``i`` goes to output bit
    ``b * n_cols + i`` — a sum of shift/mask terms, all JVM-side."""
    n_cols = len(buckets)
    z = F.lit(0).cast("long")
    for i, bk in enumerate(buckets):
        bk = bk.cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(bk, b).bitwiseAND(F.lit(1)), b * n_cols + i
            )
    return z


def zorder_value(
    df: DataFrame,
    cols: list[str],
    bits: int = 6,
    relative_error: float = 0.001,
) -> Column:
    """The per-row Morton key for ``cols`` — quantile-bucket each column
    (boundaries sampled from ``df`` itself) and interleave the bucket
    bits.  Driver cost: one ``approxQuantile`` pass, ``2^bits`` doubles
    per column."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE multi-column approxQuantile action — the per-column form runs a
    # full input scan per column, multiplying compaction I/O by len(cols)
    all_bounds = df.approxQuantile(list(cols), probs, relative_error)
    buckets = [
        _rank_bucket(F.col(c), bounds) for c, bounds in zip(cols, all_bounds)
    ]
    return _interleave(buckets, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int | None = None,
    bits: int = 6,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` to ``path`` clustered on the Z-curve over ``cols``.

    Content-identical to a plain write (the z column is dropped); only the
    row→file assignment changes, so every parquet footer's min/max range
    for EACH of ``cols`` covers a small, contiguous slab of key space and
    point/range predicates on any indexed column skip most files.

    ``n_files`` defaults to the session's ``defaultParallelism`` (one
    write stream per core at any cluster size — the same policy as
    ``pack_sequences``/``global_shuffle``); pass it explicitly for a
    size-targeted compaction (files ≈ ``input_bytes / target_file_size``).
    """
    if n_files is None:
        n_files = df.sparkSession.sparkContext.defaultParallelism
    z = zorder_value(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_skip_stats(
    spark, path: str, col: str, lo, hi
) -> dict[str, int]:
    """Measure data-skipping power: how many files of ``path`` could a
    ``col BETWEEN lo AND hi`` predicate prune on footer min/max alone?
    (Reads the data once to aggregate per-file ranges — a TEST/diagnostic
    helper, not a production path; production skipping happens inside the
    parquet reader from the same footer stats.)"""
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    # a file whose column is entirely NULL has no min/max — a range
    # predicate can always skip it (NULLs never satisfy BETWEEN), and
    # comparing None would TypeError
    hit = sum(
        1
        for r in per_file
        if r["lo"] is not None
        and r["hi"] is not None
        and not (r["hi"] < lo or r["lo"] > hi)
    )
    return {"files": len(per_file), "files_hit": hit,
            "files_skipped": len(per_file) - hit}
