"""Round-5 closing-batch-2 operators: deterministic hash split and the
domain-blocklist gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.corpus import (
    filter_blocked_domains,
    hash_split,
)


def _ids(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_hash_split_assigns_every_row_near_weights(spark):
    d = _ids(spark, 4000)
    out = hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 4000
    # hash uniformity at n=4000: generous ±25% relative tolerance
    assert abs(counts["train"] - 3200) < 200
    assert abs(counts["val"] - 400) < 100
    assert abs(counts["test"] - 400) < 100


def test_hash_split_stable_under_repartition_and_append(spark):
    d = _ids(spark, 500)
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    base = {r["doc_id"]: r["split"] for r in hash_split(d, w).collect()}
    shuffled = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.repartition(13), w).collect()
    }
    assert base == shuffled
    # appending new rows never reassigns old ones (per-row pure function)
    grown = {
        r["doc_id"]: r["split"]
        for r in hash_split(_ids(spark, 800), w).collect()
    }
    assert {k: grown[k] for k in base} == base


def test_hash_split_validates_weights(spark):
    d = _ids(spark, 10)
    with pytest.raises(ValueError):
        hash_split(d, {})
    with pytest.raises(ValueError):
        hash_split(d, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        hash_split(d, {"a": 1.2, "b": -0.2})
    # single label: everything lands there, no CASE needed
    out = hash_split(d, {"all": 1.0})
    assert {r["split"] for r in out.collect()} == {"all"}


def test_blocklist_blocks_by_registrable_domain(spark):
    rows = [
        (1, "see https://a.site3.com/x"),          # subdomain of listed .com
        (2, "go http://cdn.shared.net/y now"),     # listed registrable itself
        (3, "at https://shop.store7.co.uk/z"),     # ccTLD registrant listed
        (4, "https://other.example.org/ok"),       # unlisted
        (5, "no url at all"),                      # URL-less → never blocked
        (6, "caps https://B.SITE3.COM/up"),        # host case-insensitivity
        (7, "two https://ok.example.org/a and https://x.site3.com/b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = filter_blocked_domains(
        d, ["site3.com", "shared.net", "store7.co.uk"]
    )
    got = {r["doc_id"]: r["blocked"] for r in out.collect()}
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False,
                   6: True, 7: True}


def test_blocklist_accepts_dataframe_and_lowercases(spark):
    d = spark.createDataFrame(
        [(1, "https://a.site3.com/x"), (2, "https://b.example.org/y")],
        "doc_id long, text string",
    )
    blk = spark.createDataFrame([("SITE3.COM",)], "domain string")
    got = {r["doc_id"]: r["blocked"]
           for r in filter_blocked_domains(d, blk).collect()}
    assert got == {1: True, 2: False}


def test_blocklist_join_is_broadcast(spark):
    d = spark.createDataFrame(
        [(1, "https://a.site3.com/x")], "doc_id long, text string"
    )
    out = filter_blocked_domains(d, ["site3.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
