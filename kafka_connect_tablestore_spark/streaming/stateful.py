"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no stateful stream operators (SURVEY §2 "explicitly
absent"), but a production CDC pipeline wants per-key ingest telemetry that
survives across micro-batches: change counts, last-seen versions, delete
ratios — the streaming analogue of the batch lineage manifests.

``change_rate_monitor`` keeps per-repo state ``(n_events, n_deletes,
last_commit_ts)`` in the state store and emits the updated row for every repo
seen in the current micro-batch.  Arrow-batched (pandas per key-group), no
row-at-a-time Python; state is bounded by key cardinality and can be aged out
with ``state.setTimeoutDuration`` in processing-time mode.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("last_commit_ts", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("last_commit_ts", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, n_deletes, last_ts = (
        state.get if state.exists else (0, 0, 0)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "DELETE").sum())
        if len(pdf):
            m = pdf["commit_ts"].max()
            if pd.notna(m):  # an all-null ts group must not int(NaN)-crash
                last_ts = max(last_ts, int(m))
    state.update((n_events, n_deletes, last_ts))
    yield pd.DataFrame(
        [
            {
                "repo": key[0],
                "n_events": n_events,
                "n_deletes": n_deletes,
                "last_commit_ts": last_ts,
            }
        ]
    )


def change_rate_monitor(events_stream: DataFrame) -> DataFrame:
    """Streaming per-repo ingest telemetry (cumulative across micro-batches)."""
    return (
        events_stream.select("repo", "op", "commit_ts")
        .groupBy("repo")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_change_counts(
    events_stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time tumbling-window change counts with a late-data watermark.

    The built-in watermarked windowed aggregate (no custom state): per
    ``(window, repo)`` event and delete counts over ``commit_ts`` event
    time.  In append output mode a window row is emitted exactly once —
    when the watermark passes its end — and events later than the
    watermark are dropped, bounding state by (windows in flight × repos)
    regardless of stream length.  This is the streaming twin of the batch
    ``timeseries`` rollup and the standard Spark pattern for late CDC
    telemetry (reference has no stream-native equivalent; SURVEY §2 S18).
    """
    from pyspark.sql import functions as F

    ev = events_stream.select(
        F.timestamp_millis(F.col("commit_ts")).alias("event_time"),
        "repo",
        "op",
    )
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("repo"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("op") == "DELETE", F.lit(1))).alias("n_deletes"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "repo",
            "n_events",
            "n_deletes",
        )
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: emit only the first document carrying each
    normalized-text fingerprint, across micro-batches.

    The streaming leg of ``operators/dedup.py::dedup_exact`` for a live
    ingest feed: ``dropDuplicatesWithinWatermark`` keys state on the md5
    fingerprint (whitespace-normalized lowercased text — same canon as the
    batch operator), and the event-time watermark bounds the state store —
    a duplicate arriving later than the watermark is the caller's dedup-SLA
    trade-off, exactly how production streaming dedup bounds memory at
    10^10-event scale.  State is fingerprint-keyed, so it shuffles once on
    the fingerprint and scales with DISTINCT in-window docs, not traffic.

    Note: the streaming watermark treats rows at or before the CURRENT
    watermark as late — a row whose event time equals the epoch-zero initial
    watermark is dropped on arrival, so event times must be real
    timestamps, not small offsets from epoch.
    """
    from ..functions.text import doc_fingerprint

    return (
        docs_stream.withColumn("_fp", doc_fingerprint(text_col))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )


def streaming_sessionize(
    events_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-based sessionization: the built-in
    ``session_window`` aggregate — Spark merges events into a session
    while each arrives within ``gap`` of the session's current end, and
    in append mode emits one final row per session once the watermark
    passes session end + gap, so state is bounded by open sessions per
    key regardless of stream length.

    The streaming twin of ``operators.timeseries.sessionize``.  Boundary
    semantics differ by one instant: the batch operator keeps an event at
    EXACTLY ``gap`` after its predecessor in-session (split on ``> gap``),
    while ``session_window`` extends a session only for events strictly
    inside ``end = last + gap`` — so an event landing on the exact gap
    boundary starts a new session here.  Off-boundary inputs (any real
    clock) produce identical sessions; the equality test uses sub-gap /
    super-gap spacings so both engines agree.
    """
    from pyspark.sql import functions as F

    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sess"),
            F.col(key_col),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(
            key_col,
            "session_start",
            "session_end",
            "n_events",
            "total_value",
        )
    )
