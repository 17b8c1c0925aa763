"""Round-5 batch 3: incremental materialized-view maintenance over the
changefeed (Debezium-style before/after envelope → retract/assert delta),
per-partition event-time lag stats, and the ANN recall@k harness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.changefeed import (
    maintain_aggregate,
    snapshot_diff,
)
from kafka_connect_tablestore_spark.operators.monitor import arrival_stats
from kafka_connect_tablestore_spark.operators.similarity import topk_recall

STATE_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _state(spark, rows):
    return spark.createDataFrame(rows, STATE_SCHEMA)


def _full_recompute(state):
    return state.groupBy("repo", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.coalesce(F.length("content"), F.lit(0)))
        .cast("long")
        .alias("content_bytes"),
    )


def _view_of(df):
    return {
        (r["repo"], r["lang"]): (r["n_rows"], r["content_bytes"])
        for r in df.collect()
    }


# ---- snapshot_diff include_old ----------------------------------------------

def test_snapshot_diff_include_old_carries_pre_image(spark):
    old = _state(spark, [("r1", "a", "c1", "py", "xx"), ("r1", "b", "c2", "go", "yyy")])
    new = _state(spark, [("r1", "a", "c9", "py", "xxxx"), ("r1", "c", "c3", "py", "z")])
    rows = {
        (r["repo"], r["path"]): r.asDict()
        for r in snapshot_diff(old, new, include_old=True).collect()
    }
    upd = rows[("r1", "a")]
    assert upd["change_op"] == "UPDATE"
    assert upd["commit"] == "c9" and upd["old_commit"] == "c1"
    assert upd["content"] == "xxxx" and upd["old_content"] == "xx"
    dele = rows[("r1", "b")]
    assert dele["change_op"] == "DELETE"
    assert dele["content"] is None and dele["old_content"] == "yyy"
    ins = rows[("r1", "c")]
    assert ins["change_op"] == "INSERT"
    assert ins["old_commit"] is None and ins["old_content"] is None


def test_snapshot_diff_default_has_no_pre_image_columns(spark):
    old = _state(spark, [("r1", "a", "c1", "py", "xx")])
    new = _state(spark, [("r1", "a", "c2", "py", "xx")])
    cols = snapshot_diff(old, new).columns
    assert not [c for c in cols if c.startswith("old_")]


# ---- maintain_aggregate ------------------------------------------------------

def test_maintain_aggregate_equals_full_recompute(spark):
    old = _state(
        spark,
        [
            ("r1", "a", "c1", "py", "aa"),      # survives unchanged
            ("r1", "b", "c1", "py", "bbb"),     # content grows (same group)
            ("r1", "c", "c1", "go", "cccc"),    # lang rewrite moves groups
            ("r2", "a", "c1", "go", "d"),       # deleted; r2/go group empties
        ],
    )
    new = _state(
        spark,
        [
            ("r1", "a", "c1", "py", "aa"),
            ("r1", "b", "c2", "py", "bbbbbb"),
            ("r1", "c", "c2", "py", "cccc"),
            ("r1", "d", "c1", None, None),      # insert with null lang/content
        ],
    )
    base = _full_recompute(old)
    changes = snapshot_diff(old, new, include_old=True)
    got = _view_of(maintain_aggregate(base, changes))
    want = _view_of(_full_recompute(new))
    assert got == want
    assert ("r2", "go") not in got          # emptied group left the view
    assert got[("r1", None)] == (1, 0)      # null group key + null size


def test_maintain_aggregate_requires_pre_image(spark):
    old = _state(spark, [("r1", "a", "c1", "py", "aa")])
    new = _state(spark, [("r1", "a", "c2", "py", "aa")])
    base = _full_recompute(old)
    with pytest.raises(ValueError, match="include_old"):
        maintain_aggregate(base, snapshot_diff(old, new))


def test_maintain_aggregate_noop_changefeed_is_identity(spark):
    old = _state(spark, [("r1", "a", "c1", "py", "aa"), ("r1", "b", "c1", "go", "b")])
    base = _full_recompute(old)
    changes = snapshot_diff(old, old, include_old=True)
    assert changes.count() == 0
    assert _view_of(maintain_aggregate(base, changes)) == _view_of(base)


# ---- arrival_stats -----------------------------------------------------------

def test_arrival_stats_counts_regressions_per_partition(spark):
    log = spark.createDataFrame(
        [
            # partition 0: ts 100, 300, 250 (late by 50), 300 (tie: not late)
            ("t", 0, 0, 100),
            ("t", 0, 1, 300),
            ("t", 0, 2, 250),
            ("t", 0, 3, 300),
            # partition 1: monotone
            ("t", 1, 0, 10),
            ("t", 1, 1, 20),
        ],
        "topic string, partition int, offset long, commit_ts long",
    )
    got = {
        (r["topic"], r["partition"]): r.asDict()
        for r in arrival_stats(log).collect()
    }
    p0 = got[("t", 0)]
    assert (p0["n_events"], p0["n_late"], p0["max_lag"]) == (4, 1, 50)
    assert p0["avg_lag"] == 50.0
    p1 = got[("t", 1)]
    assert (p1["n_events"], p1["n_late"], p1["max_lag"], p1["avg_lag"]) == (2, 0, 0, 0.0)


# ---- topk_recall -------------------------------------------------------------

def test_topk_recall_per_query_hits(spark):
    ref = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12), (3, 13), (3, 14)],
        "query_id int, neighbor_id int",
    )
    cand = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 99)],  # q3 absent entirely
        "query_id int, neighbor_id int",
    )
    got = {r["query_id"]: r.asDict() for r in topk_recall(ref, cand).collect()}
    assert (got[1]["n_hits"], got[1]["recall"]) == (2, 1.0)
    assert (got[2]["n_hits"], got[2]["recall"]) == (1, 0.5)
    # a query the index returned nothing for still appears, at recall 0
    assert (got[3]["n_hits"], got[3]["recall"]) == (0, 0.0)


def test_topk_recall_ignores_candidate_duplicates(spark):
    ref = spark.createDataFrame([(1, 10), (1, 11)], "query_id int, neighbor_id int")
    cand = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 10)], "query_id int, neighbor_id int"
    )
    row = topk_recall(ref, cand).collect()[0]
    assert (row["n_hits"], row["recall"]) == (1, 0.5)


# ---- streaming view maintenance ----------------------------------------------

def test_view_maintenance_stream_tracks_full_recompute(spark, tmp_path):
    """The materialized view driven by foreachBatch across three
    micro-batches must equal a full GROUP BY over the table at EVERY
    committed version, and a checkpoint restart must not move it."""
    import os

    from kafka_connect_tablestore_spark.config import SinkConfig, DeleteMode
    from kafka_connect_tablestore_spark.engine import CdcEngine
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog
    from kafka_connect_tablestore_spark.streaming.pipeline import (
        start_view_maintenance_stream,
    )

    cfg = SinkConfig(delete_mode=DeleteMode.ROW)
    events = synth_changelog(spark, 6_000, seed=23, n_repos=30)
    src = str(tmp_path / "src")
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000), (4000, 6000)]):
        events.where(f"offset >= {lo} and offset < {hi}").coalesce(1).write.parquet(
            os.path.join(src, f"f{i}")
        )

    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    view_path = str(tmp_path / "view")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = start_view_maintenance_stream(stream, eng, view_path, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    versions = sorted(
        int(d[1:]) for d in os.listdir(view_path) if d.startswith("v")
    )
    assert len(versions) == 3  # one view version per micro-batch
    for v in versions:
        got = {
            (r["repo"], r["lang"]): (r["n_rows"], r["content_bytes"])
            for r in spark.read.parquet(os.path.join(view_path, f"v{v:06d}")).collect()
        }
        want = {
            (r["repo"], r["lang"]): (r["n_rows"], r["content_bytes"])
            for r in eng.table.read(version=v)
            .groupBy("repo", "lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.coalesce(F.length("content"), F.lit(0)))
                .cast("long")
                .alias("content_bytes"),
            )
            .collect()
        }
        assert got == want and len(got) > 0

    # restart on the same checkpoint: no new data => no new table version,
    # no new view version
    before = eng.table.current_version()
    q2 = start_view_maintenance_stream(
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*"),
        eng,
        view_path,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(300)
    assert eng.table.current_version() == before
    assert sorted(
        int(d[1:]) for d in os.listdir(view_path) if d.startswith("v")
    ) == versions


def test_bucket_pruned_changefeed_matches_full(spark, tmp_path):
    """changefeed(buckets=touched) over a batch's manifest equals the
    unpruned changefeed — and reads only the touched buckets' files."""
    from kafka_connect_tablestore_spark.config import SinkConfig, DeleteMode
    from kafka_connect_tablestore_spark.engine import CdcEngine
    from kafka_connect_tablestore_spark.sources.synth import synth_changelog

    # per-partition lineage mode computes the PRECISE touched-bucket set
    # (the observed fast path deliberately marks all buckets touched)
    cfg = SinkConfig(delete_mode=DeleteMode.ROW, lineage_per_partition=True)
    events = synth_changelog(spark, 4_000, seed=31, n_repos=20)
    eng = CdcEngine(spark, cfg, str(tmp_path / "lake"))
    eng.apply_batch(events.where("offset < 3000"), "b0")
    # a narrow second batch touches few buckets
    m = eng.apply_batch(
        events.where("offset >= 3000 and repo = 'repo_0003'"), "b1"
    )
    touched = m["touched_buckets"]
    assert 0 < len(touched) < cfg.n_buckets
    full = eng.table.changefeed(1, 2, include_old=True)
    pruned = eng.table.changefeed(1, 2, include_old=True, buckets=touched)
    key = lambda r: (r["repo"], r["path"])  # noqa: E731
    assert {key(r): r.asDict() for r in pruned.collect()} == {
        key(r): r.asDict() for r in full.collect()
    }


# ---- propagate_scores ----------------------------------------------------------

def _chain_graph(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "query_id string, neighbor_id string"
    )
    seeds = spark.createDataFrame([("a", 1.0)], "id string, score double")
    return edges, seeds


def test_propagate_scores_hand_computed_chain(spark):
    from kafka_connect_tablestore_spark.operators.clustering import propagate_scores

    edges, seeds = _chain_graph(spark)
    # s1: a=.5, b=.5*(1/1)=.5, c=0 ; s2: a=.5, b=.5*.5=.25, c=.5*.5=.25
    got = {
        r["id"]: r["score"]
        for r in propagate_scores(edges, seeds, n_iter=2, alpha=0.5).collect()
    }
    assert got == {"a": 0.5, "b": 0.25, "c": 0.25}


def test_propagate_scores_zero_rounds_is_seed_vector(spark):
    from kafka_connect_tablestore_spark.operators.clustering import propagate_scores

    edges, seeds = _chain_graph(spark)
    got = {
        r["id"]: r["score"]
        for r in propagate_scores(edges, seeds, n_iter=0).collect()
    }
    assert got == {"a": 1.0, "b": 0.0, "c": 0.0}


def test_propagate_scores_isolated_seed_survives(spark):
    from kafka_connect_tablestore_spark.operators.clustering import propagate_scores

    edges, _ = _chain_graph(spark)
    seeds = spark.createDataFrame([("z", 2.0)], "id string, score double")
    got = {
        r["id"]: r["score"]
        for r in propagate_scores(edges, seeds, n_iter=2, alpha=0.5).collect()
    }
    # the isolated seed decays by alpha each round (no inbound mass),
    # graph nodes stay at 0 (no path from z)
    assert got == {"z": 1.0, "a": 0.0, "b": 0.0, "c": 0.0}


# ---- script_profile / token_histogram ------------------------------------------

def test_script_profile_dominance_and_ties(spark):
    from kafka_connect_tablestore_spark.functions.text import script_profile

    df = spark.createDataFrame(
        [
            (1, "hello world"),                   # pure latin
            (2, "привет мир"),                     # pure cyrillic
            (3, "ab же"),                          # 2 latin vs 2 cyrillic: tie -> latin (first in order)
            (4, "!!! 123"),                        # no letters -> none
            (5, "中文中文中文 ok"),                  # cjk dominates
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in script_profile(df).collect()}
    assert got[1]["dominant_script"] == "latin" and got[1]["script_ratio"] == 1.0
    assert got[2]["dominant_script"] == "cyrillic" and got[2]["n_cyrillic"] == 9
    assert got[3]["dominant_script"] == "latin"    # first-wins tie rule
    assert got[4]["dominant_script"] == "none" and got[4]["script_ratio"] == 0.0
    assert got[5]["dominant_script"] == "cjk" and got[5]["n_cjk"] == 6


def test_token_histogram_buckets_and_shares(spark):
    from kafka_connect_tablestore_spark.functions.text import token_histogram

    df = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d e f g h")],
        "doc_id int, text string",
    )
    got = {r["bucket"]: r.asDict() for r in token_histogram(df).collect()}
    # 1 token -> bucket 0 [1,1]; 2,3 tokens -> bucket 1 [2,3]; 8 -> bucket 3 [8,15]
    assert (got[0]["lo"], got[0]["hi"], got[0]["n_docs"]) == (1, 1, 1)
    assert (got[1]["lo"], got[1]["hi"], got[1]["n_docs"]) == (2, 3, 2)
    assert (got[3]["lo"], got[3]["hi"], got[3]["n_docs"]) == (8, 15, 1)
    assert got[1]["share"] == 0.5


# ---- source_scorecard -----------------------------------------------------------

def test_source_scorecard_dup_rate_and_tokens(spark):
    from kafka_connect_tablestore_spark.operators.corpus import source_scorecard

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),        # owner of 'a b c'
            (2, "a b c", "s1"),        # dup of 1 (same source)
            (3, "a  b   c", "s2"),     # dup of 1 after whitespace canon, other source
            (4, "x y", "s2"),          # unique
        ],
        "doc_id int, text string, source string",
    )
    got = {r["source"]: r.asDict() for r in source_scorecard(df).collect()}
    s1 = got["s1"]
    assert (s1["n_docs"], s1["total_tokens"], s1["dup_rate"]) == (2, 6, 0.5)
    s2 = got["s2"]
    # doc 3 duplicates doc 1 across sources; doc 4 is clean
    assert (s2["n_docs"], s2["total_tokens"], s2["dup_rate"]) == (2, 5, 0.5)
    assert s2["mean_tokens"] == 2.5


# ---- sliding-window document chunking --------------------------------------

def test_chunk_documents_known_windows(spark):
    from kafka_connect_tablestore_spark.operators.corpus import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = {
        r["chunk_id"]: r
        for r in chunk_documents(df, max_words=8, stride=4).collect()
    }
    # n=10, max=8, stride=4: starts 0 (w0..w7) and 4 (w4..w9); start 8 would
    # add nothing (fully inside the chunk at 4) and must not be emitted
    assert set(rows) == {0, 1}
    assert rows[0]["start_word"] == 0 and rows[0]["n_words"] == 8
    assert rows[0]["chunk_text"] == " ".join(f"w{i}" for i in range(8))
    assert rows[1]["start_word"] == 4 and rows[1]["n_words"] == 6
    assert rows[1]["chunk_text"] == " ".join(f"w{i}" for i in range(4, 10))


def test_chunk_documents_short_doc_one_chunk(spark):
    from kafka_connect_tablestore_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["chunk_id"], r["n_words"], r["chunk_text"])
        for r in chunk_documents(df, max_words=8, stride=4).collect()
    }
    # short doc: one whole chunk; empty text is ZERO words (words() is
    # empty-safe since the tenth review pass), one empty chunk
    assert got == {(1, 0, 3, "a b c"), (2, 0, 0, "")}


def test_chunk_documents_no_overlap_default_reconstructs(spark):
    from kafka_connect_tablestore_spark.operators.corpus import chunk_documents

    text = " ".join(f"t{i}" for i in range(23))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, max_words=8).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride defaults to max_words: disjoint cover, concatenation == doc
    assert [r["n_words"] for r in rows] == [8, 8, 7]
    assert " ".join(r["chunk_text"] for r in rows) == text


def test_chunk_documents_validation_and_plan(spark):
    import pytest as _pytest

    from kafka_connect_tablestore_spark.operators.corpus import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_documents(df, max_words=8, stride=9)
    with _pytest.raises(ValueError, match="max_words"):
        chunk_documents(df, max_words=0)
    plan = (
        chunk_documents(df, max_words=8, stride=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # map-only: no shuffle, no window
    assert "BatchEvalPython" not in plan
