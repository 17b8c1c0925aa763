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
        "(repo string, path string, commit string, stars long) USING iceberg "
        "PARTITIONED BY (bucket(64, repo))"
    )


def test_merge_sql_covers_all_clauses():
    sql = merge_sql("lake.repos", "src", SinkConfig(), ("commit", "lang", "content"))
    assert "MERGE INTO lake.repos t USING src s ON t.repo = s.repo AND t.path = s.path" in sql
    assert "WHEN MATCHED AND s._deleted THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.commit = s.commit" in sql
    assert "WHEN NOT MATCHED AND NOT s._deleted THEN INSERT" in sql


def test_alter_sqls_from_registry_diff():
    assert alter_sqls("t", ["ADD COLUMN stars long", "WIDEN stars int->long"]) == [
        "ALTER TABLE t ADD COLUMNS (stars long)",
        "ALTER TABLE t ALTER COLUMN stars TYPE long",
    ]
