"""Iceberg backend: availability gating + SQL construction (the runtime jar
is absent in this sandbox, so execution paths raise IcebergUnavailable and
the DDL/MERGE builders are verified as pure functions)."""

from __future__ import annotations

import pytest

from kafka_connect_tablestore_spark.config import SinkConfig
from kafka_connect_tablestore_spark.lake.iceberg import (
    IcebergLakeTable,
    IcebergUnavailable,
    alter_sqls,
    create_table_sql,
    iceberg_available,
    merge_sql,
)


def test_unavailable_in_sandbox(spark):
    assert not iceberg_available(spark)
    with pytest.raises(IcebergUnavailable):
        IcebergLakeTable(spark, "lake.repos", SinkConfig())


def test_create_table_sql():
    sql = create_table_sql("lake.repos", SinkConfig(n_buckets=64), {"commit": "string", "stars": "long"})
    assert sql == (
        "CREATE TABLE IF NOT EXISTS lake.repos "
        "(repo string, path string, commit string, stars long, "
        "_deleted boolean, _ver_ts long, _ver_off long) USING iceberg "
        "PARTITIONED BY (bucket(64, repo))"
    )


def test_create_table_sql_uses_configured_pk_types():
    cfg = SinkConfig(pk_fields=("id", "path"), pk_types=("long", "string"), n_buckets=8)
    sql = create_table_sql("lake.t", cfg, {})
    assert "(id long, path string," in sql  # not hardcoded string


def test_merge_sql_retains_tombstones_with_version_guard():
    sql = merge_sql("lake.repos", "src", SinkConfig(), ("commit", "lang", "content"))
    guard = "(t._ver_ts < s._ver_ts OR (t._ver_ts = s._ver_ts AND t._ver_off <= s._ver_off))"
    assert "MERGE INTO lake.repos t USING src s ON t.repo = s.repo AND t.path = s.path" in sql
    # tombstones are RETAINED as flagged rows, never a physical DELETE: a
    # physical delete erases the version the stale-replay guard compares,
    # so a replayed old PUT would resurrect the key via NOT MATCHED INSERT
    assert "THEN DELETE" not in sql
    assert f"WHEN MATCHED AND {guard} THEN UPDATE SET t.commit = s.commit" in sql
    assert "t._deleted = s._deleted" in sql
    assert "t._ver_ts = s._ver_ts, t._ver_off = s._ver_off" in sql
    # tombstones for unseen keys INSERT too (they must exist to win the
    # version comparison against a later stale replay)
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    assert "_deleted" in sql.split("INSERT")[1]
    assert sql.count(guard) == 1  # one guarded mutate clause remains


def test_exactly_once_stamp_key_consistency():
    """The write-side conf key must stamp the summary key the read side
    queries: spark.wap.id writes summary['wap.id'] (Iceberg WAP contract).
    This is the string-level contract the round-1 bug broke (write wap.id,
    read batch_id)."""
    from kafka_connect_tablestore_spark.lake.iceberg import (
        BATCH_STAMP_CONF,
        BATCH_STAMP_KEY,
    )
    import inspect

    from kafka_connect_tablestore_spark.lake import iceberg

    assert BATCH_STAMP_CONF == f"spark.{BATCH_STAMP_KEY}"
    src = inspect.getsource(iceberg.IcebergLakeTable.committed_batches)
    assert "BATCH_STAMP_KEY" in src
    src_merge = inspect.getsource(iceberg.IcebergLakeTable.merge_batch)
    assert "BATCH_STAMP_CONF" in src_merge
    # no second, non-atomic commit for the marker
    assert "TBLPROPERTIES" not in src_merge


def test_alter_sqls_from_registry_diff():
    assert alter_sqls("t", ["ADD COLUMN stars long", "WIDEN stars int->long"]) == [
        "ALTER TABLE t ADD COLUMNS (stars long)",
        "ALTER TABLE t ALTER COLUMN stars TYPE long",
    ]
