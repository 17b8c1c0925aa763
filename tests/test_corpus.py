"""Unit tests for the corpus-assembly operators (operators/corpus.py) and
the changefeed diff (operators/changefeed.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.changefeed import snapshot_diff
from kafka_connect_tablestore_spark.operators.corpus import (
    chunk_dedup,
    global_shuffle,
    mixture_sample,
    pack_sequences,
    redact_pii,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- redact_pii

def test_redact_pii_strikes_known_spans(spark):
    d = _docs(
        spark,
        [
            (1, "mail me at alice.smith+x@sub.example.co.uk today"),
            (2, "server 192.168.0.1 and card 4111111111111111 ok"),
            (3, "clean text with short 1234 number"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(d).collect()}
    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["redacted"]
    assert "alice" not in out[1]["redacted"]
    assert out[2]["n_ips"] == 1 and out[2]["n_longnums"] == 1
    assert "<IP>" in out[2]["redacted"] and "<NUM>" in out[2]["redacted"]
    assert "4111111111111111" not in out[2]["redacted"]
    # short digit runs survive
    assert out[3]["n_longnums"] == 0 and "1234" in out[3]["redacted"]


def test_redact_pii_email_before_ip_ordering(spark):
    # the digits in an email's host must be redacted as part of the email,
    # never partially re-matched as an IP afterwards
    d = _docs(spark, [(1, "x 10.0.0.1@h.io y")])
    r = redact_pii(d).collect()[0]
    assert r["n_emails"] == 1 and r["n_ips"] == 0


# ------------------------------------------------------------ pack_sequences

def test_pack_sequences_invariants(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(200)]
    out = pack_sequences(
        _docs(spark, rows), budget=16, n_groups=4
    ).collect()
    assert len(out) == 200
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["pack_group"], []).append(r)
    total = 0
    for g, rs in by_group.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["bin_id"] == cum // 16
            assert r["start_offset"] == cum % 16
            cum += r["n_tokens"]
        total += cum
    assert total == sum(5 + i % 7 for i in range(200))


def test_pack_sequences_stable_under_repartition(spark):
    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(100)]
    d = _docs(spark, rows)
    a = sorted(map(tuple, pack_sequences(d, budget=8).collect()))
    b = sorted(map(tuple, pack_sequences(d.repartition(7), budget=8).collect()))
    assert a == b


def test_pack_sequences_rejects_bad_args(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, "a")]), budget=0)


# ------------------------------------------------------------ mixture_sample

def test_mixture_sample_hits_target_composition(spark):
    d = spark.createDataFrame(
        [(i, "t", ("en" if i % 10 < 6 else "de" if i % 10 < 9 else "fr"))
         for i in range(1000)],
        "doc_id long, text string, lang string",
    )
    out = mixture_sample(d, "lang", {"en": 40, "de": 40, "fr": 20}).collect()
    got = {}
    for r in out:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    # fr is the binding group: 100 docs / 20% → T = 500; quotas 200/200/100.
    # The hash gate is Bernoulli per row, so realized counts sit near quota.
    assert got["fr"] == pytest.approx(100, abs=25)
    assert got["en"] == pytest.approx(200, abs=40)
    assert got["de"] == pytest.approx(200, abs=40)
    # dropped groups / absent groups never leak through
    assert set(got) == {"en", "de", "fr"}


def test_mixture_sample_deterministic(spark):
    d = spark.createDataFrame(
        [(i, "t", "en" if i % 2 else "de") for i in range(300)],
        "doc_id long, text string, lang string",
    )
    a = sorted(r["doc_id"] for r in mixture_sample(d, "lang", {"en": 70, "de": 30}).collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(d.repartition(5), "lang", {"en": 70, "de": 30}).collect()
    )
    assert a == b and len(a) > 0


def test_mixture_sample_rejects_bad_args(spark):
    d = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        mixture_sample(d, "lang", {})
    with pytest.raises(ValueError):
        mixture_sample(d, "lang", {"en": 0})


# --------------------------------------------------------------- chunk_dedup

def test_chunk_dedup_removes_repeated_spans(spark):
    boiler = "same old licence header text here"  # 6 words → 2 chunks at k=3
    d = _docs(
        spark,
        [
            (1, boiler + " unique alpha beta"),
            (2, boiler + " other gamma delta"),
            (3, "totally fresh words only"),
        ],
    )
    out = {r["doc_id"]: r for r in chunk_dedup(d, chunk_words=3).collect()}
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 3
    # doc 2's two boilerplate chunks are struck, its tail survives
    assert out[2]["n_chunks"] == 3 and out[2]["n_kept"] == 1
    assert out[3]["n_kept"] == out[3]["n_chunks"] == 2
    # doc 1 survives intact → clean_md5 is the md5 of its chunked text
    expect = hashlib.md5(
        (boiler + " unique alpha beta").encode()
    ).hexdigest()
    assert out[1]["clean_md5"] == expect


def test_chunk_dedup_exact_duplicate_doc_fully_struck(spark):
    d = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    out = {r["doc_id"]: r for r in chunk_dedup(d, chunk_words=3).collect()}
    assert out[1]["n_kept"] == 2
    assert out[2]["n_kept"] == 0
    assert out[2]["clean_md5"] == hashlib.md5(b"").hexdigest()


# ------------------------------------------------------------ global_shuffle

def test_global_shuffle_is_a_permutation(spark):
    d = _docs(spark, [(i, "t") for i in range(500)])
    out = global_shuffle(d, n_shards=8).collect()
    assert len(out) == 500
    assert {r["doc_id"] for r in out} == set(range(500))
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_global_shuffle_stable_and_incremental(spark):
    d = _docs(spark, [(i, "t") for i in range(200)])
    full = {r["doc_id"]: (r["shard"], r["pos"]) for r in global_shuffle(d).collect()}
    again = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in global_shuffle(d.repartition(9)).collect()
    }
    assert full == again
    # shard assignment (not position) is stable when the corpus grows
    half = {
        r["doc_id"]: r["shard"]
        for r in global_shuffle(d.where(F.col("doc_id") < 100)).collect()
    }
    for did, shard in half.items():
        assert full[did][0] == shard


# -------------------------------------------------------------- snapshot_diff

def _state(spark, rows):
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )


def test_snapshot_diff_classifies_changes(spark):
    old = _state(
        spark,
        [
            ("r1", "a", "c1", "py", "x"),
            ("r1", "b", "c2", "py", "y"),      # unchanged
            ("r1", "c", "c3", "py", "z"),      # will be deleted
            ("r1", "d", None, "py", "w"),      # null → value = UPDATE
            ("r1", "e", None, None, None),     # null == null = unchanged
        ],
    )
    new = _state(
        spark,
        [
            ("r1", "a", "c9", "py", "x"),      # commit changed
            ("r1", "b", "c2", "py", "y"),
            ("r1", "d", "c4", "py", "w"),
            ("r1", "e", None, None, None),
            ("r2", "f", "c5", "go", "q"),      # inserted
        ],
    )
    out = {(r["repo"], r["path"]): r for r in snapshot_diff(old, new).collect()}
    assert out[("r1", "a")]["change_op"] == "UPDATE"
    assert out[("r1", "a")]["commit"] == "c9"
    assert out[("r1", "c")]["change_op"] == "DELETE"
    assert out[("r1", "c")]["commit"] is None
    assert out[("r1", "d")]["change_op"] == "UPDATE"
    assert out[("r2", "f")]["change_op"] == "INSERT"
    assert ("r1", "b") not in out and ("r1", "e") not in out


def test_snapshot_diff_roundtrip_applies(spark):
    """Applying the emitted feed onto old (delete DELETEs, upsert the rest)
    reproduces new exactly — the feed is a faithful changelog."""
    old = _state(spark, [("r", "a", "1", "py", "x"), ("r", "b", "2", "py", "y")])
    new = _state(spark, [("r", "a", "9", "py", "x2"), ("r", "c", "3", "go", "z")])
    feed = snapshot_diff(old, new)
    upserts = feed.where(F.col("change_op") != "DELETE").drop("change_op")
    deletes = feed.where(F.col("change_op") == "DELETE").select("repo", "path")
    applied = (
        old.join(feed.select("repo", "path"), ["repo", "path"], "left_anti")
        .unionByName(upserts)
    )
    assert sorted(map(tuple, applied.collect())) == sorted(map(tuple, new.collect()))
    assert deletes.count() == 1


# ------------------------------------------------- incremental chunk index

def test_incremental_chunk_dedup_matches_full_recompute(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.corpus import (
        append_to_chunk_index,
        build_chunk_index,
        incremental_chunk_dedup,
    )

    boiler = "shared header one two three four"
    corpus = _docs(
        spark,
        [(i, f"{boiler} corpus doc {i} filler words here") for i in range(10)],
    )
    batch1 = _docs(
        spark,
        [
            (100, f"{boiler} fresh alpha beta gamma delta"),   # header struck
            (101, "fresh alpha beta gamma delta entirely new"),
            (102, "fresh alpha beta gamma delta entirely new"),  # dup of 101
        ],
    )
    idx = str(tmp_path / "chunk_idx")
    build_chunk_index(corpus, idx, chunk_words=3, n_buckets=8)

    per_doc, kept = incremental_chunk_dedup(
        spark, idx, batch1, chunk_words=3, n_buckets=8
    )
    got = {r["doc_id"]: r for r in per_doc.collect()}

    full = {
        r["doc_id"]: r
        for r in chunk_dedup(
            corpus.unionByName(batch1), chunk_words=3
        ).collect()
        if r["doc_id"] >= 100
    }
    assert set(got) == set(full) == {100, 101, 102}
    for did in full:
        assert (
            got[did]["n_chunks"],
            got[did]["n_kept"],
            got[did]["clean_md5"],
        ) == (
            full[did]["n_chunks"],
            full[did]["n_kept"],
            full[did]["clean_md5"],
        ), did

    # append batch1's survivors; a replayed batch1 text in batch2 is fully struck
    append_to_chunk_index(kept, idx)
    batch2 = _docs(spark, [(200, "fresh alpha beta gamma delta entirely new")])
    per_doc2, _ = incremental_chunk_dedup(
        spark, idx, batch2, chunk_words=3, n_buckets=8
    )
    r = per_doc2.collect()[0]
    assert r["n_kept"] == 0 and r["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_incremental_chunk_probe_prunes_partitions(spark, tmp_path):
    from kafka_connect_tablestore_spark.operators.corpus import (
        build_chunk_index,
        _chunk_rows,
    )

    corpus = _docs(spark, [(i, f"doc number {i} some words") for i in range(20)])
    idx = str(tmp_path / "chunk_idx2")
    build_chunk_index(corpus, idx, chunk_words=3, n_buckets=16)
    batch = _docs(spark, [(100, "doc number 3 some words")])
    rows = _chunk_rows(batch, "text", "doc_id", 3, 16)
    buckets = sorted(r[0] for r in rows.select("bucket").distinct().collect())
    probe = spark.read.parquet(idx).where(F.col("bucket").isin(buckets))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


# ---------------------------------------------------------------- offset_gaps

def test_offset_gaps_semantics(spark):
    from kafka_connect_tablestore_spark.operators.monitor import offset_gaps

    log = spark.createDataFrame(
        [
            # partition 0: starts at 5 (not a gap), dup 7 (not a gap),
            # then 10..12 missing, then 13
            ("t", 0, 5), ("t", 0, 6), ("t", 0, 7), ("t", 0, 7),
            ("t", 0, 8), ("t", 0, 9), ("t", 0, 13),
            # partition 1: dense — no gaps
            ("t", 1, 0), ("t", 1, 1), ("t", 1, 2),
        ],
        "topic string, partition int, offset long",
    )
    out = offset_gaps(log).collect()
    assert len(out) == 1
    g = out[0]
    assert (g["partition"], g["gap_start"], g["gap_end"], g["missing"]) == (
        0, 10, 12, 3,
    )


# ----------------------------------------------------------------- winnowing

def test_winnowing_shared_run_guarantee(spark):
    from kafka_connect_tablestore_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = window+k-1
    d = _docs(
        spark,
        [
            (1, "intro words here " + shared + " tail one"),
            (2, "different lead in " + shared + " other ending"),
            (3, "no overlap with anybody at all here"),
        ],
    )
    fps = winnowing_fingerprints(d, k=3, window=4).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # any shared run of >= window+k-1 words yields >= 1 identical fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_winnowing_short_doc_emits_global_min(spark):
    from kafka_connect_tablestore_spark.operators.dedup import (
        winnowing_fingerprints,
    )

    # 4 words -> 2 shingles at k=3 (< window) -> exactly one fp, the min
    d = _docs(spark, [(1, "just four little words")])
    fps = winnowing_fingerprints(d, k=3, window=4).collect()
    assert len(fps) == 1


def test_winnowing_overlap_pairs_and_hot_fp_cap(spark):
    from kafka_connect_tablestore_spark.operators.dedup import (
        winnowing_overlap_pairs,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    boiler = "common footer words repeated on every single page"
    rows = [(1, shared + " first unique tail"), (2, shared + " second other tail")]
    # docs 10..29 share only boilerplate
    rows += [(10 + i, boiler + f" page number {i}") for i in range(20)]
    d = _docs(spark, rows)
    out = winnowing_overlap_pairs(d, min_shared=1, max_df=5).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    # the genuinely-overlapping pair survives; the 20-doc boilerplate
    # fingerprints exceed max_df and produce no pairs
    assert (1, 2) in pairs
    assert not any(a >= 10 for a, _ in pairs)
    uncapped = winnowing_overlap_pairs(d, min_shared=1, max_df=None)
    assert uncapped.where("doc_a >= 10").count() > 0


# ------------------------------------------------------------ url_domain_stats

def test_url_domain_stats_normalizes_and_counts_distinct_docs(spark):
    from kafka_connect_tablestore_spark.operators.corpus import url_domain_stats

    d = _docs(
        spark,
        [
            (1, "x https://a.b.example.com/p and https://c.example.com/q y"),
            (2, "see http://example.com/root"),
            (3, "bare host http://localhost/x and nothing else"),
            (4, "no urls at all in this one"),
        ],
    )
    out = {r["domain"]: r["n_docs"] for r in url_domain_stats(d).collect()}
    # doc 1's two subdomains collapse to one registrable domain → counted once
    assert out["example.com"] == 2
    assert out["localhost"] == 1
    assert "b.example.com" not in out and len(out) == 2


def test_mixture_sample_missing_group_yields_empty_not_renormalized(spark):
    """A targeted group absent from the data forces T=0 (nothing can hit the
    documented composition), not a silent full-volume single-group output."""
    d = spark.createDataFrame(
        [(i, "t", "en") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    out = mixture_sample(d, "lang", {"en": 50, "xx": 50})
    assert out.count() == 0
