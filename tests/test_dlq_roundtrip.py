"""DLQ round-trip (S15/S16): errant events land in the DLQ with their
original payload intact, and can be re-parsed and replayed under a corrected
config — the reference's dead-letter-topic replay pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    InsertMode,
    RuntimeErrorTolerance,
    SinkConfig,
)
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.operators.errors import reparse_dlq
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def test_dlq_reparse_and_replay(spark, tmp_path):
    # update-mode + delete none: every tombstone is a dirty record
    strict = SinkConfig(
        insert_mode=InsertMode.UPDATE,
        delete_mode=DeleteMode.NONE,
        tolerance=RuntimeErrorTolerance.ALL,
    )
    events = synth_changelog(spark, 2000, seed=61, p_delete=0.2).cache()
    eng = CdcEngine(spark, strict, str(tmp_path / "a"))
    eng.apply_batch(events, "b0")
    dlq = eng.table.read_dlq()
    n_deletes = events.where("op = 'DELETE'").count()
    assert dlq is not None and dlq.count() == n_deletes

    # reconstruct the original events from the DLQ payload
    replayable = reparse_dlq(dlq)
    orig = events.where("op = 'DELETE'").select(*replayable.columns)
    got = {tuple(r) for r in replayable.collect()}
    want = {tuple(r) for r in orig.collect()}
    assert got == want  # payload survived the DLQ byte-for-byte

    # ops widen the config (allow row deletes) and replay the dead letters:
    # final state equals a single-pass run under the corrected config
    fixed = SinkConfig(insert_mode=InsertMode.UPDATE, delete_mode=DeleteMode.ROW)
    eng2 = CdcEngine(spark, fixed, str(tmp_path / "a"))  # same lake
    eng2.apply_batch(replayable, "b0-dlq-replay")

    ref = CdcEngine(spark, fixed, str(tmp_path / "ref"))
    ref.apply_batch(events, "b0")
    sig = lambda e: {  # noqa: E731
        (r["repo"], r["path"]): r["content_sha256"] for r in e.state().collect()
    }
    assert sig(eng2) == sig(ref)
