"""Iceberg backend for the LakeTable interface.

The engine's storage verbs are deliberately Iceberg's verbs — validate-or-
create, MERGE by key, ALTER via schema diff, snapshot commit with embedded
manifest — so the parquet-fallback backend (``lake/table.py``) swaps for this
class when ``iceberg-spark-runtime`` is on the classpath (it is not in this
sandbox: methods that need the jar raise ``IcebergUnavailable``; the SQL
builders are pure functions and unit-tested regardless).

Design parity with the fallback backend:

- table partitioned by ``bucket(n_buckets, <pk1>)`` — Iceberg's hash-bucket
  transform is the reference's ``DispatchMode.HASH_PRIMARY_KEY``;
- the batch is pre-folded with :func:`plans.merge.fold_state` (LWW + the
  row-change matrix), then applied with ONE ``MERGE INTO`` whose source is
  the folded frame with a ``_deleted`` flag — tombstones are RETAINED as
  flagged rows (matched → UPDATE incl. ``_deleted``, unmatched → INSERT
  incl. tombstones), exactly like the fallback: a physical DELETE would
  let a replayed stale PUT resurrect the key through the unguarded
  NOT-MATCHED INSERT, while a versioned tombstone makes the stale row LOSE
  the ``(_ver_ts,_ver_off)`` comparison.  Readers filter ``NOT _deleted``;
  a retention-window compaction drops old tombstones (the fallback's
  ``compact(tombstone_watermark_ts=...)`` dual);
- exactly-once: the batch id is stamped on the MERGE's own snapshot summary
  (``spark.wap.id`` conf → summary key ``wap.id``, set only around the MERGE);
  re-apply checks the snapshot log (``table.snapshots``) for the same key —
  data and marker commit in the same Iceberg transaction, and a per-row
  ``(_ver_ts, _ver_off)`` guard in the MERGE keeps replayed stale batches
  from clobbering newer rows;
- schema evolution: ``ALTER TABLE ADD COLUMNS`` / ``ALTER COLUMN TYPE``
  generated from the same registry diff as the fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_tablestore_spark.config import SinkConfig
from kafka_connect_tablestore_spark.plans.schema_evolution import (
    align_to_schema,
    canon,
    evolve,
)


class IcebergUnavailable(RuntimeError):
    """iceberg-spark-runtime is not on the classpath."""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


# --------------------------------------------------------------- SQL builders

#: snapshot-summary key carrying the batch id.  ``spark.conf.set("spark.wap.id",
#: batch_id)`` stamps exactly this key on the commit's snapshot summary —
#: ``committed_batches`` MUST read the same key (write-side and read-side key
#: equality is unit-tested string-level, since the jar is absent in-sandbox).
BATCH_STAMP_KEY = "wap.id"
BATCH_STAMP_CONF = "spark.wap.id"

#: per-row version columns the MERGE guard compares — the same META order
#: columns the fold emits (plans/merge.py META_COLS).
VER_COLS = ("_ver_ts", "_ver_off")


def create_table_sql(
    table: str, config: SinkConfig, schema: dict[str, str]
) -> str:
    cols = ", ".join(
        # PK columns in their CONFIGURED types (a long/binary key hardcoded
        # to string would join and bucket on implicit casts)
        [f"{c} {t}" for c, t in zip(config.pk_fields, config.pk_types)]
        + [f"{name} {typ}" for name, typ in schema.items()]
        + ["_deleted boolean"]
        + [f"{c} long" for c in VER_COLS]
    )
    bucket_col = config.pk_fields[0]
    return (
        f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING iceberg "
        f"PARTITIONED BY (bucket({config.n_buckets}, {bucket_col}))"
    )


def merge_sql(table: str, source_view: str, config: SinkConfig, attr_fields: tuple[str, ...]) -> str:
    """MERGE with a version guard and RETAINED tombstones.

    A matched row is only touched when the source version is not older than
    the target's (``t._ver_ts < s._ver_ts`` or tie on ts broken by offset) —
    a replayed *stale* batch can never clobber rows a newer batch wrote,
    even if its idempotency stamp was lost.  Deletes become flagged rows,
    not physical DELETEs, and tombstones for unseen keys INSERT: a physical
    delete would erase the version the stale-replay guard needs, so a
    replayed old PUT of a deleted key would re-insert it through the
    unguarded NOT-MATCHED branch.  Readers filter ``NOT _deleted``."""
    on = " AND ".join(f"t.{c} = s.{c}" for c in config.pk_fields)
    guard = (
        "(t._ver_ts < s._ver_ts OR "
        "(t._ver_ts = s._ver_ts AND t._ver_off <= s._ver_off))"
    )
    sets = ", ".join(
        [f"t.{c} = s.{c}" for c in attr_fields]
        + ["t._deleted = s._deleted"]
        + [f"t.{c} = s.{c}" for c in VER_COLS]
    )
    all_cols = list(config.pk_fields) + list(attr_fields) + ["_deleted"] + list(VER_COLS)
    ins_cols = ", ".join(all_cols)
    ins_vals = ", ".join(f"s.{c}" for c in all_cols)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED AND {guard} THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def alter_sqls(table: str, changes: list[str]) -> list[str]:
    """Registry diff lines ("ADD COLUMN x long" / "WIDEN y int->long") →
    Iceberg DDL."""
    out = []
    for ch in changes:
        if ch.startswith("ADD COLUMN "):
            _, _, rest = ch.partition("ADD COLUMN ")
            name, typ = rest.split()
            out.append(f"ALTER TABLE {table} ADD COLUMNS ({name} {typ})")
        elif ch.startswith("WIDEN "):
            _, _, rest = ch.partition("WIDEN ")
            name, change = rest.split()
            wide = change.split("->")[1]
            out.append(f"ALTER TABLE {table} ALTER COLUMN {name} TYPE {wide}")
    return out


# ------------------------------------------------------------------- backend
class IcebergLakeTable:
    """Drop-in for :class:`lake.table.LakeTable` on a real cluster."""

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        config: SinkConfig,
        attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
    ) -> None:
        if not iceberg_available(spark):
            raise IcebergUnavailable(
                "iceberg-spark-runtime jar not on the classpath; use "
                "lake.table.LakeTable (the parquet snapshot backend) instead"
            )
        self.spark = spark
        self.table = table
        self.config = config
        self.attr_fields = attr_fields

    def create_if_absent(self, schema: dict[str, str]) -> None:
        self.spark.sql(create_table_sql(self.table, self.config, schema))

    def committed_batches(self) -> set[str]:
        """Batch ids previously stamped on snapshot summaries — reads back the
        SAME summary key the write path stamps (``BATCH_STAMP_KEY``)."""
        rows = self.spark.sql(
            f"SELECT summary['{BATCH_STAMP_KEY}'] AS b FROM {self.table}.snapshots"
        ).collect()
        return {r["b"] for r in rows if r["b"]}

    def merge_batch(self, folded: DataFrame, batch_id: str) -> dict:
        """``folded`` = fold_state(..., emit_meta=True) output."""
        if batch_id in self.committed_batches():
            return {"batch_id": batch_id, "skipped": True, "partitions": {}}
        meta_cols = {"_deleted", *VER_COLS}
        table_schema = {
            f.name: canon(f.dataType.simpleString())
            for f in self.spark.table(self.table).schema.fields
            if f.name not in self.config.pk_fields and f.name not in meta_cols
        }
        batch_schema = {
            f.name: canon(f.dataType.simpleString())
            for f in folded.schema.fields
            if f.name in self.attr_fields
        }
        # canon() above: Spark spells LongType 'bigint', the widening
        # lattice speaks canonical 'long' — raw simpleString names made
        # evolve() REJECT the exact int->long widening it exists to allow
        new_schema, changes = evolve(table_schema, batch_schema)
        for ddl in alter_sqls(self.table, changes):
            self.spark.sql(ddl)
        # a batch missing an evolved attribute column merges typed NULLs
        # (the fallback's align_to_schema step) instead of failing the
        # MERGE's unresolved s.<col> reference
        folded = align_to_schema(
            folded,
            new_schema,
            list(self.config.pk_fields) + ["_deleted", *VER_COLS],
        )
        attrs = tuple(new_schema)
        view = f"_batch_{abs(hash(batch_id)) % 10**9}"
        folded.createOrReplaceTempView(view)
        # Stamp the batch id on the MERGE's own snapshot summary: data and
        # idempotency marker commit in ONE Iceberg transaction.  The conf key
        # writes summary['wap.id'] — exactly what committed_batches() reads.
        # (Requires write.wap.enabled to be UNSET on the table, else the
        # snapshot is staged instead of published.)  No post-hoc ALTER: a
        # second commit would break the atomicity contract.
        self.spark.conf.set(BATCH_STAMP_CONF, batch_id)
        try:
            self.spark.sql(merge_sql(self.table, view, self.config, attrs))
        finally:
            self.spark.conf.unset(BATCH_STAMP_CONF)
        # manifest parity with LakeTable.merge_batch (the drop-in contract):
        # committed_at_version = the MERGE's own snapshot id; partitions is
        # empty (offset lineage rides the engine's stats pass, not Iceberg),
        # and touched_buckets is None — a view-maintenance consumer falls
        # back to an unpruned refresh
        (ver,) = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return {
            "batch_id": batch_id,
            "skipped": False,
            "committed_at_version": ver,
            "touched_buckets": None,
            "partitions": {},
            "schema_changes": changes,
        }
