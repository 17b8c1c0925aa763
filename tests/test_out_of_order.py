"""Versioned rows + retained tombstones: a PUT/DELETE (full-row) change log
applied in ANY batch order converges to the in-order result — late or
redelivered full-row events cannot overwrite newer state or resurrect deleted
keys.  (Partial UPDATEs keep the reference's per-key in-order contract,
``TableStoreSinkWriter.java:125``.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import DeleteMode, SinkConfig
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def sig(engine):
    return {
        (r["repo"], r["path"]): r["content_sha256"] for r in engine.state().collect()
    }


def test_put_delete_log_converges_any_order(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 3000, seed=41, p_update=0.0, p_delete=0.25).cache()
    thirds = [
        events.where(F.col("offset") % 3 == k) for k in range(3)
    ]  # interleaved slices: maximally out-of-order

    fwd = CdcEngine(spark, cfg, str(tmp_path / "fwd"))
    for k in (0, 1, 2):
        fwd.apply_batch(thirds[k], f"b-{k}")
    rev = CdcEngine(spark, cfg, str(tmp_path / "rev"))
    for k in (2, 0, 1):
        rev.apply_batch(thirds[k], f"b-{k}")
    one = CdcEngine(spark, cfg, str(tmp_path / "one"))
    one.apply_batch(events, "b-all")

    assert sig(fwd) == sig(rev) == sig(one)


def test_late_put_cannot_resurrect_deleted_key(spark, tmp_path):
    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    rows = [
        ("t", 0, 1, 100, "PUT", "r", "p", "c1", "py", "b1"),
        ("t", 0, 2, 200, "DELETE", "r", "p", None, None, None),
    ]
    schema = ("topic string, partition int, offset long, commit_ts long, op string,"
              " repo string, path string, commit string, lang string, content string")
    eng = CdcEngine(spark, cfg, str(tmp_path))
    eng.apply_batch(spark.createDataFrame([rows[1]], schema), "b-del")
    eng.apply_batch(spark.createDataFrame([rows[0]], schema), "b-late-put")
    assert eng.state().count() == 0  # tombstone at ts=200 beats late PUT at 100
    # but a genuinely newer PUT does re-create the row
    new = ("t", 0, 3, 300, "PUT", "r", "p", "c3", "py", "b3")
    eng.apply_batch(spark.createDataFrame([new], schema), "b-new-put")
    assert eng.state().first()["commit"] == "c3"
