"""Multi-table topic routing at the engine level (S2 + S21): two topics land
in two independent lake tables, each exactly-once; results equal per-topic
single-table runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine, MultiTableCdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def sig(df):
    return {(r["repo"], r["path"]): r["content_sha256"] for r in df.collect()}


def test_multi_table_routing(spark, tmp_path):
    cfg = SinkConfig(
        delete_mode=DeleteMode.ROW,
        topic_table_map={"alpha": "t_alpha"},
        table_name_format="tbl_<topic>",
    )
    a = synth_changelog(spark, 1500, seed=71, topic="alpha")
    b = synth_changelog(spark, 1500, seed=72, topic="beta").withColumn(
        "offset", F.col("offset") + 1_000_000
    )
    events = a.unionByName(b).cache()

    multi = MultiTableCdcEngine(spark, cfg, str(tmp_path / "multi"))
    manifests = multi.apply_batch(events, "b0")
    assert set(manifests) == {"t_alpha", "tbl_beta"}

    ref_a = CdcEngine(spark, cfg, str(tmp_path / "ra"))
    ref_a.apply_batch(a, "b0")
    ref_b = CdcEngine(spark, cfg, str(tmp_path / "rb"))
    ref_b.apply_batch(b, "b0")
    assert sig(multi.state("t_alpha")) == sig(ref_a.state())
    assert sig(multi.state("tbl_beta")) == sig(ref_b.state())

    # idempotent per-table redelivery
    m2 = multi.apply_batch(events, "b0")
    assert all(m["skipped"] for m in m2.values())
