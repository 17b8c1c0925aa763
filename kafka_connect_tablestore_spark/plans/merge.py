"""MERGE semantics: fold a change-log batch into final per-key state.

The reference applies row changes *sequentially* per key (hash-PK bucketed
``WriteMode.SEQUENTIAL`` writer, ``TableStoreSinkWriter.java:120-129``), so
"state" is the left fold of the PUT/UPDATE/DELETE matrix
(``RowChangeTransformer.java:201-256``) over the key's events in
``(commit_ts, offset)`` order.

Spark-first re-expression: instead of imperatively replaying (a window over a
hot key serializes into one task), the fold DECOMPOSES into associative
aggregates, evaluated by one two-phase aggregation (partial map-side + final;
SortAggregate physically, since max_by buffers carry strings) — the partial
phase pre-reduces hot keys before the shuffle, giving skew resistance for
free (see BENCH/BASELINE.md "Skew resilience"):

- barrier  B  = last event with op ∈ {PUT, DELETE}  (a "reset": PUT replaces
  the whole row, DELETE clears it).  The pre-existing target row enters the
  fold as a virtual PUT at order (-1, -1), which makes MERGE = the same fold.
- row exists  ⇔  no barrier, or B is PUT, or an UPDATE exists after B.
- per attribute column c:
    delete.mode ∈ {none, row}   →  c = last NON-NULL update of c after B,
                                    else B's value (nulls in updates ignored);
    delete.mode ∈ {column, row_and_column}
                                →  c = c of the LAST update after B (null
                                    deletes the column), else B's value.

Each branch is a ``max_by(value, conditional-order-struct)`` — associative
and partially aggregatable.  ``max_by`` ignores rows whose ordering
expression is NULL, which encodes the conditions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import COL_DELETE_MODES_, SinkConfig

ORD_COLS = ("commit_ts", "offset")

#: system metadata columns persisted per lake row: the version (order struct
#: of the last change applied to the key) and a retained tombstone flag.
#: Versioned tombstones make PUT/DELETE application order-insensitive across
#: micro-batches (late or reordered full-row events converge to the same
#: state — the LWW-register treatment).  Partial UPDATEs keep the reference's
#: own delivery contract: in-order per key (Kafka per-partition order, one key
#: per partition — exactly the assumption in ``TableStoreSinkWriter.java:125``).
META_COLS = ("_deleted", "_ver_ts", "_ver_off")


def _ord() -> Column:
    """Total order of events: struct compares lexicographically."""
    return F.struct(*[F.col(c) for c in ORD_COLS])


def fold_state(
    events: DataFrame,
    config: SinkConfig,
    attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
    emit_meta: bool = False,
) -> DataFrame:
    """Fold clean change events into final state, one row per surviving key.

    Input columns: ``pk_fields + (commit_ts, offset, op) + attr_fields``;
    ``op ∈ {PUT, UPDATE, DELETE}`` (already validated/normalized upstream).
    Output: ``pk_fields + attr_fields`` for keys that exist after the fold;
    with ``emit_meta`` every key is emitted (deleted ones flagged) plus the
    META_COLS version columns, for tombstone-retaining sinks.
    """
    if config.column_whitelist is not None:
        attr_fields = tuple(f for f in attr_fields if f in config.column_whitelist)
    pk = list(config.pk_fields)
    op = F.col("op")
    is_upd = op == F.lit("UPDATE")
    is_bar = ~is_upd  # PUT or DELETE

    # Sentinel "no such event" order: NULL (max/max_by ignore NULL orders).
    bar_ord = F.max(F.when(is_bar, _ord())).alias("_bar_ord")
    bar_row = F.max_by(
        F.struct(op.alias("op"), *[F.col(c).alias(c) for c in attr_fields]),
        F.when(is_bar, _ord()),
    ).alias("_bar")
    upd_ord = F.max(F.when(is_upd, _ord())).alias("_upd_ord")

    aggs = [bar_ord, bar_row, upd_ord]
    if emit_meta:
        aggs.append(F.max(_ord()).alias("_all_ord"))
    col_delete = config.delete_mode in COL_DELETE_MODES_
    if col_delete:
        # Last update wins wholesale (null = column delete marker,
        # DeleteMode.{COLUMN,ROW_AND_COLUMN}; RowChangeTransformer.java:230-255).
        aggs.append(
            F.max_by(
                F.struct(*[F.col(c).alias(c) for c in attr_fields]),
                F.when(is_upd, _ord()),
            ).alias("_last_upd")
        )
    else:
        # Per-column last non-null update + the order it happened at.
        for c in attr_fields:
            cond = is_upd & F.col(c).isNotNull()
            aggs.append(F.max_by(F.col(c), F.when(cond, _ord())).alias(f"_lnn_{c}"))
            aggs.append(F.max(F.when(cond, _ord())).alias(f"_lnn_ord_{c}"))

    g = events.groupBy(*pk).agg(*aggs)

    after = lambda o: o.isNotNull() & (F.col("_bar_ord").isNull() | (o > F.col("_bar_ord")))  # noqa: E731
    bar_is_put = F.col("_bar_ord").isNotNull() & (F.col("_bar.op") == F.lit("PUT"))
    exists = (
        F.col("_bar_ord").isNull()
        | bar_is_put
        | after(F.col("_upd_ord"))
    )

    out_cols: list[Column] = [F.col(c) for c in pk]
    base = lambda c: F.when(bar_is_put, F.col(f"_bar.{c}"))  # noqa: E731  (else NULL)
    if col_delete:
        upd_after = after(F.col("_upd_ord"))
        for c in attr_fields:
            out_cols.append(
                F.when(upd_after, F.col(f"_last_upd.{c}")).otherwise(base(c)).alias(c)
            )
    else:
        for c in attr_fields:
            o = F.col(f"_lnn_ord_{c}")
            out_cols.append(
                F.when(after(o), F.col(f"_lnn_{c}")).otherwise(base(c)).alias(c)
            )
    if not emit_meta:
        return g.where(exists).select(*out_cols)
    # emit_meta: every key survives; deleted rows keep null attributes and a
    # tombstone flag + version (order-insensitive PUT/DELETE convergence).
    out_cols = [F.col(c) for c in pk]
    if col_delete:
        upd_after = after(F.col("_upd_ord"))
        for c in attr_fields:
            v = F.when(upd_after, F.col(f"_last_upd.{c}")).otherwise(base(c))
            out_cols.append(F.when(exists, v).alias(c))
    else:
        for c in attr_fields:
            o = F.col(f"_lnn_ord_{c}")
            v = F.when(after(o), F.col(f"_lnn_{c}")).otherwise(base(c))
            out_cols.append(F.when(exists, v).alias(c))
    out_cols += [
        (~exists).alias("_deleted"),
        F.col("_all_ord.commit_ts").alias("_ver_ts"),
        F.col("_all_ord.offset").alias("_ver_off"),
    ]
    return g.select(*out_cols)


def merge_into_state(
    target: DataFrame | None,
    events: DataFrame,
    config: SinkConfig,
    attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
    emit_meta: bool = False,
) -> DataFrame:
    """MERGE a batch of clean events into existing ``target`` state.

    The existing row re-enters the fold as a virtual event: a PUT (or a
    DELETE, for a retained tombstone) at its stored version — or at order
    (-1, -1) when the target carries no version columns (strictly before
    every real event).  The same fold therefore implements WHEN MATCHED
    UPDATE / DELETE and WHEN NOT MATCHED INSERT in one pass (the reference's
    overwrite-by-PK idempotency, SURVEY §2 S11/S19), and stored versions make
    redelivered/reordered full-row events converge.
    """
    if config.column_whitelist is not None:
        attr_fields = tuple(f for f in attr_fields if f in config.column_whitelist)
    pk = list(config.pk_fields)
    ev = events.select(*pk, *ORD_COLS, "op", *attr_fields)
    if target is None:
        return fold_state(ev, config, attr_fields, emit_meta)
    has_meta = all(c in target.columns for c in META_COLS)
    if has_meta:
        virt = target.select(
            *pk,
            F.col("_ver_ts").alias("commit_ts"),
            F.col("_ver_off").alias("offset"),
            F.when(F.col("_deleted"), F.lit("DELETE")).otherwise(F.lit("PUT")).alias("op"),
            *[F.col(c) for c in attr_fields],
        )
    else:
        virt = target.select(
            *pk,
            F.lit(-1).cast("long").alias("commit_ts"),
            F.lit(-1).cast("long").alias("offset"),
            F.lit("PUT").alias("op"),
            *[F.col(c) for c in attr_fields],
        )
    return fold_state(virt.unionByName(ev), config, attr_fields, emit_meta)
