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
    include_old: bool = False,
) -> DataFrame:
    """Emit the row-change set transforming ``old`` into ``new``.

    A key present only in ``new`` is an INSERT; only in ``old`` a DELETE;
    in both with any attribute null-safely differing, an UPDATE (unchanged
    rows are dropped).  INSERT/UPDATE rows carry the new attribute values,
    DELETE rows carry nulls.  To re-apply a feed through the row-change
    decision matrix (operators/rowchange.py), rename ``change_op`` to
    ``op`` and map INSERT→PUT first — the matrix's op vocabulary is
    PUT/UPDATE/DELETE and anything else is dead-lettered as UNKNOWN_OP:
    ``df.withColumn("op", F.when(F.col("change_op") == "INSERT", "PUT")
    .otherwise(F.col("change_op")))``.

    With ``include_old=True`` each change row additionally carries the
    PRE-image attributes as ``old_<c>`` columns (null for INSERTs) — the
    retraction half a downstream incremental view (``maintain_aggregate``)
    needs to subtract a row's former contribution without re-reading the
    base table.  This mirrors a Debezium-style ``before``/``after``
    envelope, flattened.
    """
    # dunder marker so an attribute legitimately named "present" does not
    # collide with the membership columns (which would be ambiguous at
    # analysis time); the one reserved name is checked explicitly
    marker = "__present__"
    if any(c == marker for c in (*pk_cols, *attr_cols)):
        raise ValueError(f"snapshot_diff: column name {marker!r} is reserved")
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
    # initializer makes attr_cols=() legal: a key-only membership feed
    # emits INSERT/DELETE rows and no UPDATEs (nothing can "change")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
            for c in attr_cols
        ],
        F.lit(False),
    )
    op = (
        F.when(~in_old, F.lit("INSERT"))
        .when(~in_new, F.lit("DELETE"))
        .when(changed, F.lit("UPDATE"))
    )
    pre_image = (
        [
            F.when(in_old, F.col(f"_old_{c}")).alias(f"old_{c}")
            for c in attr_cols
        ]
        if include_old
        else []
    )
    return (
        j.select(
            *[F.col(c) for c in pk_cols],
            op.alias("change_op"),
            *[
                F.when(in_new, F.col(f"_new_{c}")).alias(c)
                for c in attr_cols
            ],
            *pre_image,
        )
        .where(F.col("change_op").isNotNull())
    )


def maintain_aggregate(
    base_agg: DataFrame,
    changes: DataFrame,
    group_cols: tuple[str, ...] = ("repo", "lang"),
    size_col: str = "content",
    n_col: str = "n_rows",
    bytes_col: str = "content_bytes",
) -> DataFrame:
    """Incrementally maintain a grouped (row count, size sum) materialized
    view from a changefeed — the Materialize/Flink-style delta-application
    path a CDC engine exists to feed, so a 10^10-row base table is never
    re-aggregated per batch.

    ``base_agg`` is the prior view state (``group_cols…, n_col, bytes_col``);
    ``changes`` is a :func:`snapshot_diff` frame built with
    ``include_old=True`` (post-image attributes in plain columns, pre-image
    in ``old_<c>``).  Each DELETE/UPDATE retracts the row's former
    contribution under its OLD group key (an update can move a row between
    groups, e.g. a lang rewrite), each INSERT/UPDATE asserts the new
    contribution under the new key; groups whose maintained count reaches
    zero leave the view, matching a full recompute exactly.

    Shape at scale: the base view is |groups| rows and the delta is
    batch-sized — ONE shuffle on the group key with map-side partial
    aggregation over (base ∪ retractions ∪ assertions); the base TABLE is
    never touched.  Reference parity: the connector itself only upserts rows
    (`TableStoreSinkTask` hands rows to the writer); view maintenance is the
    lake-native capability layered on the same change stream.
    """
    op = F.col("change_op")
    key_old = [
        F.col(f"old_{c}").alias(c) if f"old_{c}" in changes.columns else F.col(c)
        for c in group_cols
    ]
    missing = [
        c for c in group_cols
        if c not in changes.columns and f"old_{c}" not in changes.columns
    ]
    if missing:
        raise ValueError(f"group cols absent from changes frame: {missing}")
    if f"old_{size_col}" not in changes.columns:
        raise ValueError(
            "changes must come from snapshot_diff(include_old=True); "
            f"old_{size_col} column is absent"
        )
    nbytes = lambda c: F.coalesce(F.length(F.col(c)), F.lit(0)).cast("long")  # noqa: E731
    retract = changes.where(op.isin("DELETE", "UPDATE")).select(
        *key_old,
        F.lit(-1).cast("long").alias(n_col),
        (-nbytes(f"old_{size_col}")).alias(bytes_col),
    )
    assert_ = changes.where(op.isin("INSERT", "UPDATE")).select(
        *[F.col(c) for c in group_cols],
        F.lit(1).cast("long").alias(n_col),
        nbytes(size_col).alias(bytes_col),
    )
    base = base_agg.select(
        *[F.col(c) for c in group_cols],
        F.col(n_col).cast("long").alias(n_col),
        F.col(bytes_col).cast("long").alias(bytes_col),
    )
    return (
        base.unionByName(retract)
        .unionByName(assert_)
        .groupBy(*group_cols)
        .agg(
            F.sum(n_col).alias(n_col),
            F.sum(bytes_col).alias(bytes_col),
        )
        .where(F.col(n_col) > 0)
    )


def scd2_history(
    log: DataFrame,
    pk_cols: tuple[str, ...] = ("repo", "path"),
    attr_cols: tuple[str, ...] = ("commit", "lang", "content"),
    ts_col: str = "commit_ts",
    seq_col: str = "offset",
) -> DataFrame:
    """Build the SCD-type-2 version history of a table from its change log.

    Every non-DELETE change event becomes one version row carrying the
    event's attribute values, ``valid_from`` = its change timestamp and
    ``valid_to`` = the timestamp of the NEXT change to the same key
    (whatever its op — an UPDATE supersedes, a DELETE closes).  A version
    with no successor is open-ended (``valid_to`` null, ``is_current``
    true); a key whose final event is a DELETE ends with a closed interval
    and no current row — the same final-state semantics the fold engine
    (plans/merge.py, reference ``RowChangeTransformer``:
    ``transform/RowChangeTransformer.java:35-120``) produces, extended
    backwards in time.  This is the point-in-time/history leg a CDC lake
    exists for: ``WHERE valid_from <= t AND (valid_to IS NULL OR
    valid_to > t)`` reconstructs the table as of any ``t`` without
    replaying the log.

    Ordering within a key is ``(ts_col, seq_col)`` — the log's commit
    timestamp with the Kafka offset as the deterministic tiebreaker, the
    same total order the LWW fold uses (operators/lww.py).

    Shape at scale: ONE shuffle (the per-key window).  The per-task bound
    is a single key's version count — inherent to the output, since each
    version row needs its successor's timestamp; there is no cross-key
    state.  A pathologically hot key degrades this exactly as it degrades
    the LWW window strategy, and the same mitigation applies (process hot
    keys' histories with the salted two-phase variant if profiling ever
    shows one key dominating — not wired here because version counts are
    bounded by per-key update rates, not corpus size).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*pk_cols)
        .orderBy(F.col(ts_col).asc(), F.col(seq_col).asc())
    )
    return (
        log.withColumn("valid_to", F.lead(ts_col).over(w))
        .where(F.col("op") != "DELETE")
        .select(
            *[F.col(c) for c in pk_cols],
            *[F.col(c) for c in attr_cols],
            F.col(ts_col).cast("long").alias("valid_from"),
            F.col("valid_to").cast("long").alias("valid_to"),
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def asof_enrich(
    facts: DataFrame,
    log: DataFrame,
    pk_cols: tuple[str, ...] = ("repo", "path"),
    attr_cols: tuple[str, ...] = ("commit", "lang", "content"),
    fact_ts_col: str = "fact_ts",
    ts_col: str = "commit_ts",
    seq_col: str = "offset",
) -> DataFrame:
    """Enrich fact rows with the dimension state AS OF each fact's own
    timestamp (latest change with ``ts <= fact_ts``; a DELETE in effect at
    fact time yields nulls, same as "no version yet").

    The classic CDC consumption pattern — join an event stream to the
    slowly-changing state the connector maintains, at event time rather
    than at query time — implemented WITHOUT a range join: both sides are
    tagged and unioned, one per-key window computes
    ``last(version STRUCT) IGNORE NULLS`` over ``(ts, side, seq)`` with
    dimension rows ordered BEFORE facts at equal timestamps (so a change
    committed at exactly the fact's timestamp is visible to it), and fact
    rows are filtered back out carrying the filled struct.  The struct
    fill (rather than per-attribute fills) keeps one version's attributes
    atomic — a DELETE's nulls must not be skipped per-column back to the
    prior version's values.

    Shape at scale: ONE shuffle of facts ∪ changes on the key — the same
    cost as the equi-join a naive enrichment would do anyway, with the
    sort replacing the O(|facts| × |versions-per-key|) range-join blowup.
    Per-task bound: one key's facts + versions.
    """
    from pyspark.sql import Window

    ver = F.struct(
        *[F.col(c).alias(c) for c in attr_cols],
        F.col("op").alias("op"),
    )
    # the fact side's null version must carry the LOG's attribute types —
    # hardcoding string breaks the union for any non-string attribute
    log_types = {f.name: f.dataType.simpleString() for f in log.schema.fields}
    missing = [c for c in attr_cols if c not in log_types]
    if missing:
        raise ValueError(f"attr cols absent from log: {missing}")
    null_ver_type = (
        "struct<"
        + ",".join(f"{c}:{log_types[c]}" for c in attr_cols)
        + ",op:string>"
    )
    dim_side = log.select(
        *[F.col(c) for c in pk_cols],
        F.col(ts_col).cast("long").alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.lit(None).cast("long").alias("_fact_id"),
        ver.alias("_ver"),
    )
    fact_side = facts.select(
        *[F.col(c) for c in pk_cols],
        F.col(fact_ts_col).cast("long").alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(seq_col).cast("long").alias("_fact_id"),
        F.lit(None).cast(null_ver_type).alias("_ver"),
    )
    w = (
        Window.partitionBy(*pk_cols)
        .orderBy("_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        dim_side.unionByName(fact_side)
        .withColumn("_state", F.last("_ver", ignorenulls=True).over(w))
    )
    live = F.col("_state").isNotNull() & (F.col("_state.op") != "DELETE")
    return filled.where(F.col("_side") == 1).select(
        F.col("_fact_id").alias("fact_id"),
        *[F.col(c) for c in pk_cols],
        F.col("_ts").alias("fact_ts"),
        *[
            F.when(live, F.col(f"_state.{c}")).alias(f"asof_{c}")
            for c in attr_cols
        ],
    )


def log_asof_prefix(
    log: DataFrame,
    ts_col: str = "commit_ts",
    fraction: float = 0.5,
    keep: str = "prefix",
    bounds: DataFrame | None = None,
) -> DataFrame:
    """Restrict a change log to the events at or before the corpus-time
    point ``min_ts + floor((max_ts - min_ts) * fraction)`` — the input to
    point-in-time reconstruction ("the table as of t" = the final-state
    fold of the log prefix, the replay-side dual of the SCD2 interval
    lookup in :func:`scd2_history`).  ``keep="suffix"`` returns the strict
    complement (events AFTER the bound) — the incremental tail a
    bootstrap-then-stream cutover consumes (:func:`bootstrap_handoff`).

    The bound is computed as a 1-row broadcast aggregate cross-joined back
    onto the log, NOT collected to the driver: the whole plan stays
    cluster-side (a broadcast nested-loop of a scalar against the scan),
    so a 10^10-row log never routes data through the driver and the
    timestamp filter sits directly above the source scan where a format
    with min/max statistics (parquet row groups, Iceberg manifests) can
    prune files wholesale.

    ``bounds`` lets a caller slicing the same log several ways pass one
    precomputed (optionally pre-materialized) :func:`asof_bounds` frame so
    the min/max pass runs once, not once per slice.

    ``fraction`` uses integer floor division on the span so the bound is
    bit-identical across engines (Spark ``div`` / DuckDB ``//``).  The
    span is split as ``span = q·10^6 + r`` before scaling —
    ``floor(span·f) = q·num + floor(r·num / 10^6)`` exactly — so neither
    product can exceed int64 for any timestamp unit (a naive
    ``span * num`` wraps for microsecond logs spanning ~107 days under
    non-ANSI Spark arithmetic, silently emptying the prefix).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if keep not in ("prefix", "suffix"):
        raise ValueError(f"keep must be 'prefix' or 'suffix', got {keep!r}")
    if bounds is None:
        bounds = asof_bounds(log, ts_col, fraction)
    # null timestamps order before every real event (the fold's struct
    # ordering puts nulls first), so they belong to the PREFIX — a bare
    # `<=`/`>` pair would drop them from BOTH slices and the cutover
    # invariant prefix ∪ suffix = log would silently break
    cond = (
        F.col(ts_col).isNull() | (F.col(ts_col) <= F.col("_as_of"))
        if keep == "prefix"
        else F.col(ts_col).isNotNull() & (F.col(ts_col) > F.col("_as_of"))
    )
    return log.crossJoin(F.broadcast(bounds)).where(cond).drop("_as_of")


def asof_bounds(
    log: DataFrame, ts_col: str = "commit_ts", fraction: float = 0.5
) -> DataFrame:
    """The 1-row ``(_as_of)`` bound frame :func:`log_asof_prefix` filters
    against.  Exposed so a caller slicing the SAME log both ways
    (:func:`bootstrap_handoff`: prefix fold + redelivery + tail) computes
    the min/max aggregate ONCE and passes it to each call — Spark plans
    each branch's identical aggregate subtree separately (no
    ReusedExchange across a broadcast-scalar subtree), so without sharing,
    a 10^10-row log pays one redundant full-log bounds pass per branch."""
    num = int(round(fraction * 1000000))
    return log.agg(
        F.min(ts_col).alias("_ts_min"), F.max(ts_col).alias("_ts_max")
    ).select(
        (
            F.col("_ts_min")
            + F.expr(
                f"((_ts_max - _ts_min) div 1000000) * {num}"
                f" + (((_ts_max - _ts_min) % 1000000) * {num}) div 1000000"
            )
        ).alias("_as_of")
    )


def bootstrap_handoff(
    log: DataFrame,
    config,
    attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
    *,
    ts_col: str = "commit_ts",
    offset_col: str = "offset",
    fraction: float = 0.5,
    redeliver_every: int | None = 3,
) -> DataFrame:
    """Initial-snapshot bootstrap → incremental-tail cutover, with the
    at-least-once overlap a real handoff produces: fold the log prefix up
    to the corpus-time bound into a tombstone-retaining snapshot
    (``emit_meta=True`` — versions + retained tombstones), then MERGE the
    tail onto it.  ``redeliver_every`` re-delivers every n-th PREFIX event
    into the tail (the tail consumer deliberately starts before the
    snapshot bound so the cutover can never drop an event; duplicates are
    the price), and the versioned fold must absorb them: a redelivered
    event is never newer than the snapshot row's stored version, so it
    loses every per-column ``max_by`` race — including the
    update-after-delete case, where only the RETAINED tombstone's virtual
    DELETE outranks a stale partial UPDATE (a snapshot that dropped deleted
    rows would resurrect them here).

    The result must equal the single-pass fold of the full log — the
    bootstrap dual of :func:`~kafka_connect_tablestore_spark.operators.
    monitor.dedup_redelivered`'s within-batch invariant, proved across the
    snapshot/tail boundary instead.  Shape at scale: two folds (one key
    aggregate each, map-side combined) and no extra shuffle beyond them.
    The corpus-time bound is computed ONCE — a 1-row :func:`asof_bounds`
    aggregate materialized eagerly here (``localCheckpoint``) and shared
    by the prefix fold, the redelivery branch, and the tail — because
    Spark plans each branch's identical aggregate subtree independently:
    without the shared materialization the handoff pays three full-log
    bounds passes instead of one (measured: three min/max aggregates in
    the executed plan, zero ReusedExchange).
    """
    from kafka_connect_tablestore_spark.operators.rowchange import (
        split_errant,
        validate_and_classify,
    )
    from kafka_connect_tablestore_spark.plans.merge import merge_into_state

    bounds = asof_bounds(log, ts_col, fraction).localCheckpoint(eager=True)
    prefix = log_asof_prefix(log, ts_col, fraction, keep="prefix", bounds=bounds)
    clean_p, _ = split_errant(
        validate_and_classify(prefix, config, attr_fields)
    )
    snapshot = merge_into_state(None, clean_p, config, attr_fields, emit_meta=True)
    tail = log_asof_prefix(log, ts_col, fraction, keep="suffix", bounds=bounds)
    if redeliver_every:
        tail = tail.unionByName(
            prefix.where(F.pmod(F.col(offset_col), F.lit(redeliver_every)) == 0)
        )
    clean_t, _ = split_errant(
        validate_and_classify(tail, config, attr_fields)
    )
    return merge_into_state(snapshot, clean_t, config, attr_fields)
