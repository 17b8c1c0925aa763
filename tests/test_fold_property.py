"""Property-style randomized equivalence: the distributed fold must equal the
sequential oracle on arbitrary event interleavings, for every
insert.mode × delete.mode combination.

All random cases for a config are folded in ONE Spark job by prefixing the
primary key with a case id — 60 cases × 8 configs stay fast while covering
thousands of op/null-shape interleavings (the generative analogue of the
ported 24-case matrix)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from kafka_connect_tablestore_spark.config import DeleteMode, InsertMode, SinkConfig
from kafka_connect_tablestore_spark.operators.rowchange import (
    split_errant,
    validate_and_classify,
)
from kafka_connect_tablestore_spark.oracle import replay
from kafka_connect_tablestore_spark.plans.merge import merge_into_state

ATTRS = ("commit", "lang", "content")

SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("commit_ts", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("case", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def gen_case(rng: random.Random, case: str, n: int) -> list[tuple]:
    rows = []
    for i in range(n):
        op = rng.choice(["PUT", "UPDATE", "DELETE"])
        repo = rng.choice(["r1", "r2", None if rng.random() < 0.05 else "r1"])
        path = rng.choice(["a", "b", "c"])
        if op == "DELETE":
            c = lg = ct = None
        else:
            c = rng.choice([None, f"c{i}"])
            lg = rng.choice([None, "py", "go"])
            ct = rng.choice([None, f"body{i}", f"body{i % 3}"])
        rows.append(("t", 0, i, 1000 + i, op, case, repo, path, c, lg, ct))
    return rows


MODES = [
    (im, dm, wl)
    for im in (InsertMode.PUT, InsertMode.UPDATE)
    for dm in (DeleteMode.NONE, DeleteMode.ROW, DeleteMode.COLUMN, DeleteMode.ROW_AND_COLUMN)
    for wl in (None, ("commit", "lang"))
]


@pytest.mark.parametrize("insert_mode,delete_mode,whitelist", MODES)
def test_random_interleavings_match_oracle(spark, insert_mode, delete_mode, whitelist):
    rng = random.Random(f"{insert_mode}-{delete_mode}")
    all_rows: list[tuple] = []
    n_cases = 60
    for k in range(n_cases):
        all_rows += gen_case(rng, f"case{k:03d}", rng.randint(3, 25))

    cfg = SinkConfig(
        pk_fields=("case", "repo", "path"),
        pk_types=("string", "string", "string"),
        insert_mode=insert_mode,
        delete_mode=delete_mode,
        column_whitelist=whitelist,
    )
    df = spark.createDataFrame(all_rows, SCHEMA)
    classified = validate_and_classify(df, cfg, ATTRS)
    clean, errant = split_errant(classified)
    state = merge_into_state(None, clean, cfg, ATTRS)
    attrs = tuple(a for a in ATTRS if whitelist is None or a in whitelist)
    got = {
        (r["case"], r["repo"], r["path"]): tuple(r[a] for a in attrs)
        for r in state.collect()
    }
    got_errs = errant.count()

    events = [dict(zip(SCHEMA.fieldNames(), row)) for row in all_rows]
    want_state, want_dlq = replay(events, cfg, ATTRS)
    want = {pk: tuple(a.get(c) for c in attrs) for pk, a in want_state.items()}
    assert got_errs == len(want_dlq)
    assert got.keys() == want.keys(), (
        f"extra={list(got.keys() - want.keys())[:3]} "
        f"missing={list(want.keys() - got.keys())[:3]}"
    )
    mismatches = [(k, got[k], want[k]) for k in want if got[k] != want[k]]
    assert not mismatches, mismatches[:5]
