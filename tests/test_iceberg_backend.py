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
        "_ver_ts long, _ver_off long) USING iceberg "
        "PARTITIONED BY (bucket(64, repo))"
    )


def test_merge_sql_covers_all_clauses():
    sql = merge_sql("lake.repos", "src", SinkConfig(), ("commit", "lang", "content"))
    guard = "(t._ver_ts < s._ver_ts OR (t._ver_ts = s._ver_ts AND t._ver_off <= s._ver_off))"
    assert "MERGE INTO lake.repos t USING src s ON t.repo = s.repo AND t.path = s.path" in sql
    assert f"WHEN MATCHED AND {guard} AND s._deleted THEN DELETE" in sql
    assert f"WHEN MATCHED AND {guard} THEN UPDATE SET t.commit = s.commit" in sql
    assert "t._ver_ts = s._ver_ts, t._ver_off = s._ver_off" in sql
    assert "WHEN NOT MATCHED AND NOT s._deleted THEN INSERT" in sql
    # the version guard must gate BOTH mutate clauses (stale-replay safety)
    assert sql.count(guard) == 2


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
