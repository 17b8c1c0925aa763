"""Round-5 additions: CCNet-style boilerplate-span removal, DSIR
importance log-weights, and gap-based event sessionization."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.corpus import (
    dsir_logweights,
    strip_boilerplate,
)
from kafka_connect_tablestore_spark.operators.timeseries import sessionize


# ---- strip_boilerplate ------------------------------------------------------

def _corpus(spark):
    # "legal disclaimer here" (3 words = one chunk at chunk_words=3) appears
    # in 3 docs; every doc also carries unique content
    rows = [
        (1, "legal disclaimer here alpha beta gamma"),
        (2, "legal disclaimer here delta epsilon zeta"),
        (3, "legal disclaimer here eta theta iota"),
        (4, "kappa lambda mu nu xi omicron"),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_strip_boilerplate_removes_frequent_chunk_everywhere(spark):
    out = strip_boilerplate(
        _corpus(spark), chunk_words=3, min_df=3
    ).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    # the shared chunk is struck from ALL three docs, incl. the first
    for d in (1, 2, 3):
        assert by_id[d]["n_chunks"] == 2
        assert by_id[d]["n_removed"] == 1
    assert by_id[1]["clean_md5"] == _md5("alpha beta gamma")
    # a doc with no boilerplate is untouched
    assert by_id[4]["n_removed"] == 0
    assert by_id[4]["clean_md5"] == _md5("kappa lambda mu nu xi omicron")
    # null-text doc re-enters with zeros and the empty hash
    assert by_id[5]["n_chunks"] == 0 and by_id[5]["clean_md5"] == _md5("")


def test_strip_boilerplate_below_threshold_keeps_everything(spark):
    out = strip_boilerplate(_corpus(spark), chunk_words=3, min_df=4).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_strip_boilerplate_differs_from_chunk_dedup_on_first_copy(spark):
    # chunk_dedup keeps the FIRST copy of a repeated span; boilerplate
    # removal keeps none — doc 1's shared chunk must be gone here
    out = strip_boilerplate(_corpus(spark), chunk_words=3, min_df=2)
    r1 = out.where(F.col("doc_id") == 1).collect()[0]
    assert r1["n_removed"] == 1


def test_strip_boilerplate_validates_args(spark):
    with pytest.raises(ValueError):
        strip_boilerplate(_corpus(spark), chunk_words=0)
    with pytest.raises(ValueError):
        strip_boilerplate(_corpus(spark), min_df=0)


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


# ---- dsir_logweights --------------------------------------------------------

def test_dsir_prefers_target_like_docs(spark):
    # target talks about cats; raw corpus is cats + finance. A cat doc must
    # outscore a finance doc under the target distribution.
    target = spark.createDataFrame(
        [(100 + i, "cat kitten purr whiskers feline") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "cat kitten purr whiskers feline"),
            (2, "stock bond yield derivative margin"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_logweights(raw, target, n_buckets=64).collect()
    }
    assert out[1] > out[2]


def test_dsir_matches_reference_math(spark):
    # tiny hand-checkable case: recompute the smoothed bucket ratios in
    # pure Python over the same md5 bucket function and compare
    docs = [(1, "a b a"), (2, "c d")]
    raw = spark.createDataFrame(docs, "doc_id long, text string")
    target = spark.createDataFrame([docs[0]], "doc_id long, text string")
    B, alpha = 16, 1.0

    import hashlib

    def bucket(w):
        return int(hashlib.md5(f"dsir|{w}".encode()).hexdigest()[:15], 16) % B

    def counts(rows):
        c = {}
        for _, t in rows:
            for w in t.split():
                c[bucket(w)] = c.get(bucket(w), 0) + 1
        return c

    tc, rc = counts([docs[0]]), counts(docs)
    tt, rt = sum(tc.values()), sum(rc.values())

    def lw(b):
        return (
            math.log(tc.get(b, 0) + alpha)
            - math.log(tt + alpha * B)
            - math.log(rc.get(b, 0) + alpha)
            + math.log(rt + alpha * B)
        )

    expect = {
        did: round(sum(lw(bucket(w)) for w in t.split()), 4)
        for did, t in docs
    }
    got = {
        r["doc_id"]: r["dsir_logweight"]
        for r in dsir_logweights(raw, target, n_buckets=B).collect()
    }
    assert got == expect


def test_dsir_scoring_stage_is_map_only(spark):
    # the corpus-scoring pass must be a single map stage: no exchange, no
    # Python eval — the bucket-ratio map is a constant-folded literal
    docs = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("x y z").alias("text")
    )
    out = dsir_logweights(docs, docs.limit(5), n_buckets=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # scoring never shuffles the corpus


def test_dsir_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_logweights(df, df, n_buckets=0)
    with pytest.raises(ValueError):
        dsir_logweights(df, df, alpha=0.0)


# ---- sessionize -------------------------------------------------------------

def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_sessionize_splits_on_gap(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two events 10 min apart (one session), then a 2 h gap
        (1, t0, 1, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1, 2.0),
        (3, t0 + dt.timedelta(hours=2, minutes=10), 1, 4.0),
        # user 2: a single event
        (4, t0, 2, 8.0),
    ]
    out = sessionize(_ev(spark, rows), gap_seconds=1800).orderBy(
        "user_id", "session_seq"
    ).collect()
    assert [(r["user_id"], r["session_seq"], r["n_events"], r["total_value"])
            for r in out] == [(1, 1, 2, 3.0), (1, 2, 1, 4.0), (2, 1, 1, 8.0)]
    assert out[0]["session_start"] == t0
    assert out[0]["session_end"] == t0 + dt.timedelta(minutes=10)


def test_sessionize_boundary_gap_stays_in_session(spark):
    # a gap of EXACTLY gap_seconds does not split (strict >)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, 1.0), (2, t0 + dt.timedelta(seconds=1800), 1, 1.0)]
    out = sessionize(_ev(spark, rows), gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_equal_ts_ties_break_on_id(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(2, t0, 1, 1.0), (1, t0, 1, 1.0)]
    out = sessionize(_ev(spark, rows), gap_seconds=60).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_single_window_shuffle(spark):
    # lag window, running sum, and the rollup all share the user_id
    # partitioning: exactly ONE exchange in the plan
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(seconds=i), i % 3, 1.0) for i in range(30)]
    plan = sessionize(_ev(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_sessionize_validates_gap(spark):
    with pytest.raises(ValueError):
        sessionize(_ev(spark, []), gap_seconds=0)


# ---- streaming_sessionize ---------------------------------------------------

def test_streaming_sessionize_matches_batch(spark, tmp_path):
    import os

    from kafka_connect_tablestore_spark.streaming.stateful import (
        streaming_sessionize,
    )

    # two users, off-boundary gaps (no event exactly gap-apart, where the
    # batch/streaming boundary rules legitimately differ)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, 1.0),
        (2, t0 + dt.timedelta(minutes=5), 1, 2.0),
        (3, t0 + dt.timedelta(minutes=90), 1, 4.0),   # new session (>30m)
        (4, t0 + dt.timedelta(minutes=93), 1, 8.0),
        (5, t0, 2, 16.0),
        (6, t0 + dt.timedelta(hours=3), 2, 32.0),     # new session
        # a closing event far in the future so the watermark passes every
        # session above and append mode emits them
        (7, t0 + dt.timedelta(days=2), 3, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_time timestamp, user_id long, value double"
    )
    src = str(tmp_path / "sess_src")
    df.where("event_id <= 4").coalesce(1).write.parquet(os.path.join(src, "f0"))
    df.where("event_id > 4").coalesce(1).write.parquet(os.path.join(src, "f1"))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        streaming_sessionize(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["total_value"])
        for r in spark.sql(
            "SELECT * FROM sess_stream WHERE user_id < 3"
        ).collect()
    }
    batch = sessionize(
        df.selectExpr(
            "event_id", "event_time AS ts", "user_id", "value"
        ).where("user_id < 3"),
        gap_seconds=1800,
    ).collect()
    want = {
        (r["user_id"], r["session_start"], r["session_end"],
         r["n_events"], r["total_value"])
        for r in batch
    }
    assert got == want


def test_strip_boilerplate_emit_text(spark):
    out = strip_boilerplate(
        _corpus(spark), chunk_words=3, min_df=3, emit_text=True
    )
    by_id = {r["doc_id"]: r for r in out.collect()}
    assert by_id[1]["clean_text"] == "alpha beta gamma"
    assert by_id[5]["clean_text"] == ""
    # the md5 column stays consistent with the emitted text
    assert by_id[1]["clean_md5"] == _md5(by_id[1]["clean_text"])
