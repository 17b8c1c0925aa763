"""Z-order layout optimization: multi-column data skipping.

The quantitative claim under test: after ``zorder_write`` on (x, y), a
point-range predicate on EITHER column prunes most files on parquet
footer min/max alone, while a single-column sort only prunes for the
sorted column — the property that makes the layout worth a rewrite at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.lake.optimize import (
    file_skip_stats,
    zorder_value,
    zorder_write,
)

N_FILES = 32


def _grid(spark):
    # 100×100 grid, x/y independent — worst case for single-column sort
    return (
        spark.range(10_000)
        .select(
            F.col("id"),
            (F.col("id") % 100).alias("x"),
            (F.col("id") / 100).cast("long").alias("y"),
        )
    )


def test_zorder_skips_on_both_columns(spark, tmp_path):
    df = _grid(spark)
    zpath = str(tmp_path / "z")
    xpath = str(tmp_path / "xsort")
    zorder_write(df, zpath, ["x", "y"], n_files=N_FILES)
    (
        df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.parquet(xpath)
    )

    # a 10%-selectivity band on each column
    zx = file_skip_stats(spark, zpath, "x", 40, 49)
    zy = file_skip_stats(spark, zpath, "y", 40, 49)
    sx = file_skip_stats(spark, xpath, "x", 40, 49)
    sy = file_skip_stats(spark, xpath, "y", 40, 49)

    assert zx["files"] == N_FILES
    # x-sort is near-perfect on x (a 10%-band hits ~10% of files + range
    # boundary straddles) and useless on y
    assert sx["files_skipped"] >= N_FILES - 6
    assert sy["files_skipped"] == 0
    # z-order skips meaningfully on BOTH columns.  The bound is a third of
    # the files, not the ~90% a perfect sort gives one column: each file
    # covers a z-interval that straddles tile boundaries (range shuffle
    # boundaries don't align to the curve), and the low-bit column's span
    # per tile is wider — measured 44%/78% skipped at 32 files on this
    # grid, vs 0% for the unsorted column of a single-column sort.
    assert zx["files_skipped"] >= N_FILES // 3, zx
    assert zy["files_skipped"] >= N_FILES // 3, zy


def test_zorder_is_content_identical(spark, tmp_path):
    df = _grid(spark)
    path = str(tmp_path / "z")
    zorder_write(df, path, ["x", "y"], n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == df.columns
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_zorder_handles_skew_and_nulls(spark, tmp_path):
    # Zipf-ish x: 90% of rows share one hot value; y uniform; some NULLs.
    # Quantile bucketing must still spread rows across files (file sizes
    # stay balanced) and skipping on the non-skewed column must survive.
    df = spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("x"),
        F.when(F.col("id") % 97 == 0, None)
        .otherwise((F.col("id") / 100).cast("long"))
        .alias("y"),
    )
    path = str(tmp_path / "z")
    zorder_write(df, path, ["x", "y"], n_files=8)
    sizes = [
        r["n"]
        for r in spark.read.parquet(path)
        .groupBy(F.input_file_name())
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) <= 4 * min(sizes), sizes  # range shuffle balances skew
    zy = file_skip_stats(spark, path, "y", 40, 49)
    assert zy["files_skipped"] >= 2, zy


def test_zorder_value_is_jvm_only(spark):
    df = _grid(spark)
    plan = (
        df.withColumn("_z", zorder_value(df, ["x", "y"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def test_compact_with_zorder_tightens_rowgroup_stats(spark, tmp_path):
    """LakeTable.compact(zorder_cols=...): bucket assignment (the MERGE
    contract) is untouched, but within each bucket file the parquet
    row-group min/max spans of the indexed columns become tight slabs —
    measured directly from the footers via pyarrow against a plain
    compact of the same table."""
    import glob

    import pyarrow.parquet as pq

    from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
    from kafka_connect_tablestore_spark.engine import CdcEngine
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 16 * 1024)  # force many row groups
    try:
        cfg = SinkConfig(delete_mode=DeleteMode.ROW, n_buckets=4)
        events = (
            synth_changelog(spark, 6000, seed=61)
            .withColumn("stars", (F.xxhash64("offset") % 1000).cast("int"))
            .cache()
        )
        attrs = ("commit", "lang", "content", "stars")

        def spans(root):
            out, n_groups = [], 0
            for f in glob.glob(f"{root}/*/data/snap*/_bucket=*/*.parquet"):
                md = pq.ParquetFile(f).metadata
                idx = {
                    md.row_group(0).column(i).path_in_schema: i
                    for i in range(md.row_group(0).num_columns)
                }["stars"]
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(idx).statistics
                    if st is not None and st.has_min_max:
                        out.append(st.max - st.min)
                        n_groups += 1
            return sum(out) / len(out), n_groups

        results = {}
        for key, zcols in [("plain", None), ("z", ["stars"])]:
            lake = str(tmp_path / key)
            eng = CdcEngine(spark, cfg, lake, attr_fields=attrs)
            eng.replay(events, n_batches=3)
            state = {
                (r["repo"], r["path"], r["content_sha256"], r["stars"])
                for r in eng.state().collect()
            }
            eng.table.compact(zorder_cols=zcols)
            eng.table.vacuum()
            after = {
                (r["repo"], r["path"], r["content_sha256"], r["stars"])
                for r in eng.state().collect()
            }
            assert after == state and len(after) > 0  # content identical
            results[key] = (spans(lake), state)

        (span_plain, n_plain), st_plain = results["plain"]
        (span_z, n_z), st_z = results["z"]
        assert st_plain == st_z
        assert n_plain >= 8 and n_z >= 8, (n_plain, n_z)  # stats are real
        # z-sorted row groups cover tight stars-ranges; unsorted cover ~all
        assert span_z < 0.5 * span_plain, (span_z, span_plain)
    finally:
        if old_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", old_block)
