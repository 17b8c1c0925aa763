"""Last-writer-wins dedup (SURVEY §2 S12).

The reference guarantees "later offset overwrites earlier" *physically*:
hash(PK)-bucketed dispatch + sequential in-bucket writes
(``TableStoreSinkWriter.java:120-129``, golden test
``TableStoreWriterTest.java:93-104`` — 1000 updates to one key, final value
"999").  Spark makes the order *declarative*: pick the max-(commit_ts, offset)
event per key.

Three strategies, all semantically identical:

1. ``lww_dedup_window``  — ``row_number() OVER (PARTITION BY pk ORDER BY ...
   DESC) = 1``.  Simple; but a hot key funnels into a single task.
2. ``lww_dedup_maxby``   — ``groupBy(pk).agg(max_by(struct(*), ord))``.
   Partial-aggregatable: Catalyst's two-phase HashAggregate pre-reduces each
   map partition, so a hot key arrives at the reducer already collapsed to
   ~num_input_partitions rows.  Default at scale.
3. ``lww_dedup_salted``  — explicit two-phase reduction
   ``groupBy(pk, salt) → groupBy(pk)``, forcing the pre-reduce through a
   narrow salt shuffle.  For the pathological case where map-side combine is
   defeated (e.g. pre-sorted-by-key input sections) at 10^10 events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the ONE event-order definition, shared with the merge fold: LWW winners
# and fold winners must never disagree on what "later" means
from kafka_connect_tablestore_spark.plans.merge import ORD_COLS


def _payload(df: DataFrame, pk: tuple[str, ...]) -> list[str]:
    return [c for c in df.columns if c not in pk]


def lww_dedup_window(df: DataFrame, pk: tuple[str, ...] = ("repo", "path")) -> DataFrame:
    w = Window.partitionBy(*pk).orderBy(*[F.desc(c) for c in ORD_COLS])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_maxby(df: DataFrame, pk: tuple[str, ...] = ("repo", "path")) -> DataFrame:
    other = _payload(df, pk)
    ord_ = F.struct(*[F.col(c) for c in ORD_COLS])
    g = df.groupBy(*pk).agg(F.max_by(F.struct(*other), ord_).alias("_w"))
    return g.select(*pk, *[F.col(f"_w.{c}").alias(c) for c in other])


def lww_dedup_salted(
    df: DataFrame,
    pk: tuple[str, ...] = ("repo", "path"),
    n_salts: int = 8,
) -> DataFrame:
    """Salted two-phase LWW: phase 1 reduces (pk, salt) groups — the hot key
    fans out across ``n_salts`` reducers — phase 2 reduces the ≤ n_salts
    survivors per key.  Salt is a deterministic hash of the tie-break columns
    so replays land identically."""
    other = _payload(df, pk)
    ord_ = F.struct(*[F.col(c) for c in ORD_COLS])
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in ORD_COLS]), F.lit(n_salts)).alias("_salt")
    p1 = (
        df.withColumn("_salt", salt)
        .groupBy(*pk, "_salt")
        .agg(F.max_by(F.struct(*other), ord_).alias("_w"))
        .select(*pk, *[F.col(f"_w.{c}").alias(c) for c in other])
    )
    return lww_dedup_maxby(p1, pk)
