"""Changefeed emission: diff two table states into a stream of row changes.

The reference connector is a one-way sink (Kafka → table); a lake-native
engine can also run the reverse leg — read two snapshots of the same table
and emit the INSERT / UPDATE / DELETE rows that transform one into the
other (an Iceberg ``changelog``-style incremental read, computed
relationally when the format doesn't materialize one).  This is what feeds
a downstream consumer that wants "changes since offset X" without replaying
the whole log.

Shape at scale: one full-outer join on the primary key — co-partitioned when
both sides come from the same bucketed table (zero extra shuffle), plain
key-shuffle otherwise.  Column comparison is null-safe (``IS DISTINCT
FROM``), entirely JVM-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: tuple[str, ...] = ("repo", "path"),
    attr_cols: tuple[str, ...] = ("commit", "lang", "content"),
) -> DataFrame:
    """Emit the row-change set transforming ``old`` into ``new``.

    A key present only in ``new`` is an INSERT; only in ``old`` a DELETE;
    in both with any attribute null-safely differing, an UPDATE (unchanged
    rows are dropped).  INSERT/UPDATE rows carry the new attribute values,
    DELETE rows carry nulls — the same frame shape the row-change decision
    matrix (operators/rowchange.py, reference RowChangeTransformer) accepts,
    so a feed can be re-applied downstream.
    """
    marker = "_present"
    o = old.select(
        *[F.col(c) for c in pk_cols],
        *[F.col(c).alias(f"_old_{c}") for c in attr_cols],
        F.lit(True).alias(f"_old{marker}"),
    )
    n = new.select(
        *[F.col(c) for c in pk_cols],
        *[F.col(c).alias(f"_new_{c}") for c in attr_cols],
        F.lit(True).alias(f"_new{marker}"),
    )
    j = o.join(n, list(pk_cols), "full_outer")
    in_old = F.col(f"_old{marker}").isNotNull()
    in_new = F.col(f"_new{marker}").isNotNull()
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
            for c in attr_cols
        ],
    )
    op = (
        F.when(~in_old, F.lit("INSERT"))
        .when(~in_new, F.lit("DELETE"))
        .when(changed, F.lit("UPDATE"))
    )
    return (
        j.select(
            *[F.col(c) for c in pk_cols],
            op.alias("change_op"),
            *[
                F.when(in_new, F.col(f"_new_{c}")).alias(c)
                for c in attr_cols
            ],
        )
        .where(F.col("change_op").isNotNull())
    )
