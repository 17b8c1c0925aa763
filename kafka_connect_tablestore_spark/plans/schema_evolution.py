"""Schema evolution: registry diff → additive ALTER / type widening (S17+).

The reference only *validates or creates* the target schema
(``utils/ParamChecker.java:24-97``, ``TableStoreSinkWriter.java:280-354``);
the north rule upgrades that to real evolution: before each micro-batch,
diff the batch's attribute schema against the table's registered schema and

- ADD new columns (existing rows read as NULL),
- WIDEN types along the reference's own lattice (int→long, float→double —
  exactly the widenings in ``ColumnCoverterUtil.java:57-70``),
- REJECT narrowing / incompatible changes, like ``ParamChecker.java:41-65``
  rejects PK type mismatches.

The registry is the versioned ``schema`` field of each lake snapshot — a
schema change is only visible atomically with the data commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: widening partial order: source → allowed wider targets (reflexive closure
#: implied).  Mirrors ColumnCoverterUtil.java:57-70.
_WIDENS_TO = {
    "int": {"long", "double"},
    "long": {"double"},
    "float": {"double"},
}

_SPARK_TYPES = {
    "int": T.IntegerType(), "long": T.LongType(), "float": T.FloatType(),
    "double": T.DoubleType(), "string": T.StringType(),
    "boolean": T.BooleanType(), "binary": T.BinaryType(),
}


#: Spark ``simpleString`` names → registry canonical names
_CANON = {"bigint": "long", "smallint": "int", "tinyint": "int"}


def canon(type_name: str) -> str:
    return _CANON.get(type_name.lower(), type_name.lower())


class SchemaEvolutionError(TypeError):
    """Incompatible schema change (narrowing / type conflict)."""


def widen(a: str, b: str) -> str:
    """Least common widened type of ``a`` and ``b``; raises if incompatible."""
    if a == b:
        return a
    if b in _WIDENS_TO.get(a, ()):
        return b
    if a in _WIDENS_TO.get(b, ()):
        return a
    raise SchemaEvolutionError(f"cannot reconcile column types {a!r} vs {b!r}")


def batch_attr_schema(df: DataFrame, attr_fields: tuple[str, ...]) -> dict[str, str]:
    by_name = {f.name: canon(f.dataType.simpleString()) for f in df.schema.fields}
    out = {c: by_name[c] for c in attr_fields if c in by_name}
    for name, typ in out.items():
        if typ not in _SPARK_TYPES:
            # the reference rejects non-scalar column types outright
            # (ColumnCoverterUtil.java:57-76, DefaultEventParserTest.java:594-628)
            raise SchemaEvolutionError(
                f"unsupported attribute type {typ!r} for column {name!r} "
                f"(supported: {sorted(_SPARK_TYPES)})"
            )
    return out


def evolve(
    table_schema: dict[str, str], batch_schema: dict[str, str]
) -> tuple[dict[str, str], list[str]]:
    """Return ``(new_table_schema, change_log)``.

    ``change_log`` lists human-readable ALTERs applied ("ADD COLUMN x long",
    "WIDEN y int->long"); empty when schemas already agree."""
    out = dict(table_schema)
    changes: list[str] = []
    for name, typ in batch_schema.items():
        if name not in out:
            out[name] = typ
            changes.append(f"ADD COLUMN {name} {typ}")
        else:
            w = widen(out[name], typ)
            if w != out[name]:
                changes.append(f"WIDEN {name} {out[name]}->{w}")
                out[name] = w
    return out, changes


def align_to_schema(df: DataFrame, schema: dict[str, str], key_cols: list[str]) -> DataFrame:
    """Project ``df`` to ``key_cols + schema`` — missing columns become typed
    NULLs, present columns are cast to the (possibly widened) table type."""
    cols = [F.col(c) for c in key_cols]
    for name, typ in schema.items():
        t = _SPARK_TYPES[typ]
        if name in df.columns:
            cols.append(F.col(name).cast(t).alias(name))
        else:
            cols.append(F.lit(None).cast(t).alias(name))
    return df.select(*cols)
