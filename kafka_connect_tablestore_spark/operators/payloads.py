"""Schemaless MAP and raw STRING payload parsing (SURVEY §1.1 shapes 2+3).

The reference's ``DefaultEventParser`` handles three payload shapes; round 1
covered only STRUCT.  This module adds the other two, Spark-first:

- **MAP / null schema** (``DefaultEventParser.java:73-108, 246-294``):
  schemaless JSON → dynamically-typed ``Map<String,Object>``.  Spark carries
  it as a ``map<string,string>`` column (SURVEY §1.5); parsing is
  ``try_element_at`` + ``try_cast`` — pure Catalyst expressions, null-safe
  under ANSI mode.

  Two typing regimes, mirroring the reference:

  * **declared** (whitelist with types, ``TableStoreSinkConfig.java:835-883``):
    each declared field is cast to its declared type; a present-but-uncastable
    value is a TYPE_MISMATCH errant record
    (``DefaultEventParser.java:144-149, 333-339`` throw → S14 tolerance gate),
    closing round 1's gap where bad-typed records silently null-cast.
  * **dynamic** (no whitelist, ``utils/ColumnCoverterUtil.java:79-92``):
    per-VALUE type mapping — Number→DOUBLE, Boolean→BOOLEAN, else STRING.  A
    DataFrame column has one static type, so the dynamic bag is emitted TALL
    (one row per attribute, ``explode(map)``), each attribute independently
    typed — exactly the wide-column row model of the target store.

- **STRING** (``DefaultEventParser.java:233-237, 178-182, 191-195``): a raw
  string payload becomes a single attribute column named ``value`` (or
  ``key`` when the string is on the key side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import PrimaryKeyMode, SinkConfig
from kafka_connect_tablestore_spark.functions.casts import widened_type_name
from kafka_connect_tablestore_spark.operators.projection import merge_key_value
from kafka_connect_tablestore_spark.operators.rowchange import ERROR_COL

#: string shapes the dynamic typer recognizes as numbers / booleans —
#: the schemaless-JSON analogue of ``instanceof Number / Boolean`` in
#: ``ColumnCoverterUtil.java:79-92``.  Covers every textual form a JSON
#: parser would have materialized as a Number: optional sign (incl. leading
#: '+', which lenient parsers accept), integer/decimal (``1``, ``1.5``,
#: ``.5``, ``5.``), and scientific notation (``1e5``, ``-2.5E-3``).
_NUM_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def parse_map_payload(
    df: DataFrame,
    config: SinkConfig,
    declared: dict[str, str],
    value_col: str = "value_map",
) -> DataFrame:
    """Declared-type MAP parse: extract + cast each whitelisted field.

    Adds one typed column per declared field and ``error_info`` =
    'TYPE_MISMATCH:<field>' for the first field whose value is present but
    does not cast to its declared type (the reference throws on the first
    mismatch, ``DefaultEventParser.java:144-149``).  Absent fields are null
    (whitelisted-but-missing fields are skipped, ``:304-346``).  Feed the
    result to the S14 tolerance gate / DLQ split like any classified frame.
    """
    m = F.col(value_col)
    out_cols = list(df.columns)
    err: Column = F.lit(None).cast("string")
    typed: list[Column] = []
    for name, typ in declared.items():
        target = widened_type_name(typ)
        raw = F.try_element_at(m, F.lit(name))
        val = raw.try_cast(target)
        typed.append(val.alias(name))
        # first mismatch wins (reference throws at the first bad field)
        err = F.coalesce(
            err,
            F.when(raw.isNotNull() & val.isNull(), F.lit(f"TYPE_MISMATCH:{name}")),
        )
    return df.select(*out_cols, *typed, err.alias(ERROR_COL))


def explode_map_payload(
    df: DataFrame,
    key_cols: tuple[str, ...],
    value_col: str = "value_map",
) -> DataFrame:
    """Dynamic (no-whitelist) MAP parse, emitted tall: one output row per
    attribute with its per-value inferred type — Number→double,
    Boolean→boolean, else string (``ColumnCoverterUtil.java:79-92``).

    Output: ``key_cols + (field, dyn_type, v_double, v_boolean, v_string)``;
    exactly one of the three value columns is non-null per row.  Map-only at
    scale (explode fuses into the scan; no shuffle).

    ``explode_outer``: a record whose map is null (the tombstone signal in
    the reference — ``value == null``) or empty keeps ONE row with a null
    ``field``/``dyn_type``, so its key stays visible to downstream delete
    handling instead of vanishing from the output."""
    exploded = df.select(
        *key_cols, F.explode_outer(F.col(value_col)).alias("field", "_raw")
    )
    raw = F.col("_raw")
    is_num = raw.rlike(_NUM_RE)
    is_bool = raw.isin("true", "false")
    dyn = (
        F.when(F.col("field").isNull(), F.lit(None).cast("string"))
        .when(is_num, F.lit("double"))
        .when(is_bool, F.lit("boolean"))
        .otherwise(F.lit("string"))
    )
    return exploded.select(
        *key_cols,
        "field",
        dyn.alias("dyn_type"),
        F.when(is_num, raw.try_cast("double")).alias("v_double"),
        F.when(is_bool, raw == F.lit("true")).alias("v_boolean"),
        F.when(~is_num & ~is_bool, raw).alias("v_string"),
    )


def parse_string_payload(
    df: DataFrame, payload_col: str, side: str = "value"
) -> DataFrame:
    """Raw STRING payload → a single attribute column named ``value`` (or
    ``key`` for key-side strings) — ``DefaultEventParser.java:233-237``.
    The original payload column is replaced by the canonically-named one."""
    if side not in ("value", "key"):
        raise ValueError("side must be 'value' or 'key'")
    keep = [c for c in df.columns if c != payload_col]
    return df.select(*keep, F.col(payload_col).cast("string").alias(side))


# ------------------------------------------------------ key/value merge (S9)
def parse_key_value(
    df: DataFrame,
    config: SinkConfig,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Full key/value record parse (S4 + S9): flatten a Kafka-shaped record
    with ``key`` and ``value`` payload columns into engine event columns.

    Reference semantics (``DefaultEventParser.java:107-214``):

    - PK fields are pulled from the **mode-selected side** — the key payload
      for ``pk_mode=record_key``, the value payload for ``record_value``
      (``parseForPrimaryKey``, ``:107-155``); a record PK field whose type
      class differs from the configured ``pk_types`` entry is an error
      (``:142-149`` throws — a struct column's type is static, so the
      per-record throw becomes a plan-time raise here).
    - The attribute bag is the **value fields first, then the key fields,
      key overwriting value on a name clash** (``parseForColumns``
      ``:156-195``: value ``putAll`` then key ``putAll`` into one
      ``LinkedHashMap``).
    - PK-named fields never land in the attribute bag
      (``parseStructForColumns`` skips primary-key names, ``:304-346``),
      and the column whitelist filters what remains.
    - A STRING-shaped payload contributes a single column named ``value`` /
      ``key`` — but not on the side the PK is extracted from
      (``:178-182, 191-195``).

    Everything is a plain ``select`` over struct-field accessors — Catalyst
    prunes unread struct fields into the parquet scan; zero Python per row.
    """
    from pyspark.sql.types import StringType, StructType

    key_type = df.schema[key_col].dataType
    val_type = df.schema[value_col].dataType
    key_is_struct = isinstance(key_type, StructType)
    val_is_struct = isinstance(val_type, StructType)

    if config.pk_mode is PrimaryKeyMode.RECORD_KEY:
        pk_src, pk_is_struct = key_col, key_is_struct
    elif config.pk_mode is PrimaryKeyMode.RECORD_VALUE:
        pk_src, pk_is_struct = value_col, val_is_struct
    else:
        raise ValueError(
            "parse_key_value requires pk_mode record_key or record_value "
            "(RowChangeTransformer.java:76-89 dispatch)"
        )
    if not pk_is_struct:
        raise TypeError(
            f"pk_mode={config.pk_mode.value} needs a STRUCT {pk_src!r} payload "
            "(DefaultEventParser.java:113-118: non-struct key/value cannot "
            "carry named PK fields)"
        )

    # --- PK columns: strict type-class check, then cast -------------------
    pk_struct: StructType = df.schema[pk_src].dataType
    pk_exprs: list[Column] = []
    for name, typ in zip(config.pk_fields, config.pk_types):
        if name not in pk_struct.names:
            # absent PK field ⇒ every record errant; surfaced as null PK to
            # the S14 gate (DefaultEventParser.java:130-138 throws per record)
            pk_exprs.append(F.lit(None).cast(typ).alias(name))
            continue
        actual = _TYPE_CLASS.get(pk_struct[name].dataType.simpleString())
        if actual != typ:
            raise TypeError(
                f"PK field {name!r} is declared {typ} but the record has "
                f"{pk_struct[name].dataType.simpleString()} "
                "(DefaultEventParser.java:142-149 strict PK type check)"
            )
        pk_exprs.append(F.col(f"{pk_src}.{name}").cast(typ).alias(name))

    # --- attribute bag: value fields, then key fields overwrite -----------
    val_fields = list(val_type.names) if val_is_struct else []
    key_fields = list(key_type.names) if key_is_struct else []
    drop = set(config.pk_fields)
    merged = merge_key_value(
        [c for c in val_fields if c not in drop],
        [c for c in key_fields if c not in drop],
    )
    if config.column_whitelist is not None:
        merged = [c for c in merged if c in config.column_whitelist]
    attr_exprs = [
        F.col(f"{key_col if c in key_fields else value_col}.{c}").alias(c)
        for c in merged
    ]
    # STRING-shaped payloads → one column named after the side, except on
    # the PK-extraction side (DefaultEventParser.java:178-182, 191-195);
    # the synthetic column is an attribute like any other, so the whitelist
    # gates it too
    wl = config.column_whitelist
    if isinstance(val_type, StringType) and config.pk_mode is not PrimaryKeyMode.RECORD_VALUE:
        if wl is None or "value" in wl:
            attr_exprs.append(F.col(value_col).alias("value"))
    if isinstance(key_type, StringType) and config.pk_mode is not PrimaryKeyMode.RECORD_KEY:
        if wl is None or "key" in wl:
            attr_exprs.append(F.col(key_col).alias("key"))

    envelope = [c for c in df.columns if c not in (key_col, value_col)]
    return df.select(*envelope, *pk_exprs, *attr_exprs)


# ------------------------------------------------------- struct strict check
_TYPE_CLASS = {
    "tinyint": "long", "smallint": "long", "int": "long", "bigint": "long",
    "float": "double", "double": "double",
    "string": "string", "boolean": "boolean", "binary": "binary",
}


def check_declared_struct_types(df: DataFrame, declared: dict[str, str]) -> None:
    """Strict whitelist-declared vs record-schema type check for STRUCT
    payloads (``DefaultEventParser.java:333-339``): the record's field type
    class must equal the declared class (all int widths are one class, all
    float widths another — ``ColumnCoverterUtil.java:57-76``).  A DataFrame
    column's type is static, so the reference's per-record throw becomes a
    plan-time raise — every record would be errant."""
    dtypes = dict(df.dtypes)
    for name, typ in declared.items():
        if name not in dtypes:
            continue  # absent fields are skipped (whitelist semantics)
        declared_class = widened_type_name(typ)
        actual_class = _TYPE_CLASS.get(dtypes[name])
        if actual_class is None or actual_class != declared_class:
            raise TypeError(
                f"whitelist declares {name!r} as {declared_class} but the "
                f"record schema has {dtypes[name]} "
                "(DefaultEventParser.java:333-339 strict check)"
            )
