"""Column whitelist / projection (SURVEY §2 S7) and key/value merge (S9).

Reference: whitelist filtering in ``DefaultEventParser.java:304-346`` (struct)
/ ``:246-294`` (map), config ``TableStoreSinkConfig.java:835-883``; PK-named
fields always dropped from the attribute bag; key fields merged over value
fields on name clash (``DefaultEventParser.java:156-214``).

Spark-first: a plain ``select`` — Catalyst prunes the unread columns all the
way into the parquet scan (check ``ReadSchema`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_connect_tablestore_spark.config import SinkConfig

ENVELOPE = ("topic", "partition", "offset", "commit_ts", "op")


def project_attributes(
    df: DataFrame,
    config: SinkConfig,
    keep_envelope: bool = True,
) -> DataFrame:
    """Keep PK fields + (whitelisted) attribute columns (+ envelope).

    Whitelisted names absent from the batch are skipped, mirroring
    ``DefaultEventParser.java:320-329`` (absent field ⇒ not written)."""
    cols = [c for c in ENVELOPE if keep_envelope and c in df.columns]
    cols += list(config.pk_fields)
    # envelope names are NEVER attributes: with keep_envelope=False and no
    # whitelist they would otherwise fall through into the attribute bag
    # and the flag would be a no-op
    attrs = [c for c in df.columns if c not in cols and c not in ENVELOPE]
    if config.column_whitelist is not None:
        attrs = [c for c in attrs if c in config.column_whitelist]
    return df.select(*cols, *attrs)


def merge_key_value(value_df_cols: list[str], key_cols: list[str]) -> list[str]:
    """Order of the merged attribute bag (``DefaultEventParser.java:156-214``):
    ``LinkedHashMap`` ``putAll(value)`` then ``putAll(key)`` — a key field
    that clashes with a value field keeps the VALUE side's position (a
    ``LinkedHashMap`` re-put preserves insertion order) while its value comes
    from the key; key-only fields append at the end."""
    return list(value_df_cols) + [c for c in key_cols if c not in value_df_cols]
