"""Physical-plan audits (the 100 TB checklist).

- **Zero per-row Python** (BASELINE.json input_hint): no non-Arrow
  ``BatchEvalPython`` node may appear in any queries() plan; Python is only
  allowed as Arrow-batched nodes (``ArrowEvalPython`` / ``MapInPandas``,
  used solely by the multimodal stub).
- **Pushdown & pruning**: filters and column projections must reach the
  parquet scan (``PushedFilters`` / narrow ``ReadSchema``).
- **Codegen**: the CDC hot path must run inside WholeStageCodegen spans.
- **No driver-side loops**: collect-based operators are forbidden in the
  batch plan; the engine's only collects are config-bounded metadata
  (asserted by source inspection of the stats pass).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em

SF_DIR = "/root/testdata/sf0.001"


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(em.queries()))
def test_no_row_at_a_time_python(spark, name):
    df = em.queries()[name](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, f"{name} has row-at-a-time Python:\n{plan}"


def test_multimodal_is_arrow_batched(spark):
    df = em.queries()["pipe_multimodal_features"](spark, SF_DIR)
    assert "MapInPandas" in physical_plan(df)


def test_filter_and_projection_pushdown(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where(F.col("event_type") == "error")
        .select("event_id", "user_id")
    )
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in plan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint" in plan


def test_changelog_scan_prunes_columns(spark):
    # the tombstone filter only needs 5 derived cols — the scan must not
    # read value/props
    df = em.queries()["cdc_tombstone_filter"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "props" not in plan.split("ReadSchema")[1][:200]


def test_cdc_fold_is_codegened(spark):
    df = em.queries()["cdc_final_state"](spark, SF_DIR)
    df.collect()  # AQE: codegen spans only visible in the finalized plan
    plan = physical_plan(df)
    assert "isFinalPlan=true" in plan
    # '*(n)' prefixes mark WholeStageCodegen stages in the simple plan string
    assert "*(" in plan, plan
    assert "BatchEvalPython" not in plan


def test_lww_maxby_uses_partial_aggregation(spark):
    """The skew story: max_by must run as two-phase HashAggregate
    (partial → final), so hot keys pre-reduce map-side."""
    df = em.queries()["cdc_lww_maxby"](spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2, plan


def test_merge_plan_has_exactly_two_shuffles(spark):
    """The ingest hot path budget: shuffle 1 = the fold groupBy(pk) (with
    map-side partial aggregation pre-reducing repeated keys), shuffle 2 = the
    bucket repartition before the partitioned write — moving only the folded
    (deduped) states, never the raw events twice."""
    from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
    from kafka_connect_tablestore_spark.functions.hashing import bucket_of
    from kafka_connect_tablestore_spark.operators.rowchange import (
        split_errant,
        validate_and_classify,
    )
    from kafka_connect_tablestore_spark.plans.merge import merge_into_state
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog

    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    ev = synth_changelog(spark, 1000, seed=81)
    clean, _ = split_errant(validate_and_classify(ev, cfg, ("commit", "lang", "content")))
    merged = merge_into_state(None, clean, cfg, ("commit", "lang", "content"), emit_meta=True)
    out = merged.withColumn("_bucket", bucket_of(cfg.pk_fields, cfg.n_buckets)).repartition(
        cfg.n_buckets, "_bucket"
    )
    plan = physical_plan(out)
    assert plan.count("Exchange hashpartitioning") == 2, plan
    # two-phase aggregation (partial map-side + final) — max_by over string
    # payloads uses SortAggregate (non-fixed-width buffers), which still
    # pre-reduces hot keys before the shuffle
    n_aggs = sum(plan.count(k) for k in ("HashAggregate(", "ObjectHashAggregate(", "SortAggregate("))
    assert n_aggs >= 2, plan
    assert "partial" in plan.lower() or n_aggs >= 2


def test_ann_broadcasts_query_side(spark):
    df = em.queries()["pipe_ann_brute"](spark, SF_DIR)
    assert "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def test_key_value_parse_prunes_struct_fields(spark, tmp_path):
    """parse_key_value is a plain select over struct-field accessors, so
    Catalyst must prune unread struct fields into the parquet scan: with a
    whitelist keeping only 'note', the value struct's other fields must not
    be read."""
    from kafka_connect_tablestore_spark.config import PrimaryKeyMode, SinkConfig
    from kafka_connect_tablestore_spark.operators.payloads import parse_key_value

    src = spark.createDataFrame(
        [(0, ("r1", "a"), ("c1", "n1", "x" * 10))],
        "offset long, key struct<repo:string,path:string>, "
        "value struct<commit:string,note:string,content:string>",
    )
    p = str(tmp_path / "kv.parquet")
    src.write.parquet(p)
    df = parse_key_value(
        spark.read.parquet(p),
        SinkConfig(pk_mode=PrimaryKeyMode.RECORD_KEY, column_whitelist=("note",)),
    )
    plan = physical_plan(df)
    # value struct narrowed to note only: neither commit nor content is read
    assert "note" in plan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "content" not in read_schema[0] and "commit" not in read_schema[0]


def test_shingle_explodes_never_reinlined_into_scan_filters(spark):
    """Regression guard for InferFiltersFromGenerate + pushdown: an INNER
    explode of a computed shingle/chunk array gets a `size(child) > 0`
    filter inferred, and predicate pushdown substitutes the whole shingle
    expression — word-split re-inlined per element_at reference — into a
    scan-level filter (measured 10x on decontamination).  The shingle-family
    operators use outer generates, so no optimized plan may contain a Filter
    evaluating element_at/split below the Generate."""
    import re

    for name in ("pipe_decontaminate", "pipe_chunk_dedup"):
        df = em.queries()[name](spark, SF_DIR)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        for line in opt.splitlines():
            if re.match(r"\s*[+:]?-?\s*Filter ", line):
                assert "element_at" not in line, f"{name}: shingle work re-inlined into a filter:\n{line[:400]}"


def test_mixture_sample_broadcasts_quotas(spark):
    """The corpus side must never shuffle: quota plan joins in as a
    BroadcastHashJoin, no SortMergeJoin anywhere."""
    df = em.queries()["pipe_mixture_sample"](spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_corpus_map_only_ops_have_no_shuffle(spark):
    """PII redaction and stratified sampling are pure per-row expressions —
    a KEY shuffle in their plans means a regression.  The r6 scan
    parallelizer may add ONE round-robin exchange above a tiny single-split
    scan (that is data movement for parallelism, not operator logic — and
    a no-op at real scale); hash partitioning is still forbidden."""
    for name in ("pipe_pii_redact", "pipe_stratified_sample"):
        plan = physical_plan(em.queries()[name](spark, SF_DIR))
        assert "Exchange hashpartitioning" not in plan, (
            f"{name} shuffles on a key:\n{plan[:500]}"
        )
        assert plan.count("Exchange") <= 1, f"{name} shuffles:\n{plan[:500]}"


def test_seq_pack_and_shuffle_use_one_keylocal_exchange(spark):
    """Packing and global shuffle each need exactly one hash exchange (the
    group/shard window) — a second exchange or a global sort is a
    regression."""
    for name in ("pipe_seq_pack", "pipe_global_shuffle"):
        plan = physical_plan(em.queries()[name](spark, SF_DIR))
        assert plan.count("Exchange hashpartitioning") == 1, name
        assert "rangepartitioning" not in plan, f"{name} global-sorts"
