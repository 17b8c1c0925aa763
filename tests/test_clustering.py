"""Connected-components near-dup clustering: chains collapse to one cluster;
cluster-level dedup keeps exactly one survivor per component."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.operators.clustering import (
    connected_components,
    dedup_neardup,
)


def test_connected_components_chain_and_islands(spark):
    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # chain 0-1-2-3, pair 5-6, islands 4 and 7
    pairs = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 2), (5, 6)], "doc_a long, doc_b long"
    )
    comp = {r["doc_id"]: r["cluster_id"] for r in connected_components(ids, pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_dedup_neardup_on_duplicated_texts(spark):
    # three exact-dup groups (exact dups are jaccard=1.0 near-dups) + uniques
    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "a completely different document about spark aggregation and shuffles",
        "yet another unique text describing minhash lsh banding and jaccard",
    ]
    rows = []
    for i, t in enumerate(base):
        for k in range(3):  # 3 copies each
            rows.append((i * 10 + k, t))
    rows.append((100, "totally unrelated single document with unique words entirely"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = dedup_neardup(df, jaccard_threshold=0.9).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 10
    # each dup group clusters to its min id; only that id survives
    for i in range(3):
        members = [i * 10 + k for k in range(3)]
        clusters = {by_id[m]["cluster_id"] for m in members}
        assert clusters == {i * 10}
        assert [by_id[m]["is_survivor"] for m in members] == [True, False, False]
    assert by_id[100]["is_survivor"] and by_id[100]["cluster_id"] == 100
    assert sum(r["is_survivor"] for r in out) == 4
