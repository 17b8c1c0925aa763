"""Type conversion along the reference's column-type lattice (SURVEY §2 S8).

``utils/ColumnCoverterUtil.java:24-76``: every integer width → INTEGER
(int64), every float width → DOUBLE, BYTES → BINARY, BOOLEAN → BOOLEAN,
anything → STRING on request.  Dynamic (schemaless) values map
Number→DOUBLE, bytes→BINARY, Boolean→BOOLEAN, else STRING (``:79-92``).

Spark-first: plain ``cast`` expressions — codegen'd, no UDF.  Config-vs-data
type mismatch handling (``DefaultEventParser.java:333-339``) lives in
``operators/payloads.py``: per-record TYPE_MISMATCH → ``error_info`` → the
S14 tolerance gate for dynamic MAP payloads (``parse_map_payload``), and a
plan-time strict check for static STRUCT schemas
(``check_declared_struct_types``).  This module is the happy-path cast only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_tablestore_spark.config import COLUMN_TYPE_WIDENING

_SPARK_TYPES = {
    "long": T.LongType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
}

#: source Spark type → widened engine type (mirrors the Connect lattice)
_WIDEN_SPARK = {
    "tinyint": "long", "smallint": "long", "int": "long", "bigint": "long",
    "float": "double", "double": "double",
    "string": "string", "boolean": "boolean", "binary": "binary",
}


def widened_type_name(source: str) -> str:
    """Widen a type name along the lattice; raises on unsupported types
    (nested/array/map are errors in the reference —
    ``ColumnCoverterUtil.java:57-76``, ``DefaultEventParserTest.java:594-628``)."""
    key = source.lower()
    if key in COLUMN_TYPE_WIDENING:
        return COLUMN_TYPE_WIDENING[key]
    if key in _WIDEN_SPARK:
        return _WIDEN_SPARK[key]
    raise TypeError(f"unsupported column type {source!r} (reference rejects non-scalars)")


def cast_column_lattice(df: DataFrame, declared: dict[str, str] | None = None) -> DataFrame:
    """Cast every column to its widened engine type.

    ``declared`` optionally pins target types per column (the whitelist's
    declared types, ``TableStoreSinkConfig.java:835-883``); other columns are
    widened from their current Spark type."""
    out = []
    for f in df.schema.fields:
        name = f.name
        if declared and name in declared:
            # declared names use the whitelist's Connect vocabulary
            # (int64/float32/bytes/...) — widen them onto the engine lattice
            target = widened_type_name(declared[name])
        else:
            target = widened_type_name(f.dataType.simpleString())
        out.append(F.col(name).cast(_SPARK_TYPES[target]).alias(name))
    return df.select(*out)
