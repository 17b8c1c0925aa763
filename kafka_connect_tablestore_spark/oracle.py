"""Pure-Python sequential replay oracle.

Applies a change log event-by-event with exactly the reference's row-change
semantics (``utils/RowChangeTransformer.java:201-256`` — the PUT/UPDATE ×
delete-mode × null-shape matrix, tested exhaustively in
``RowChangeTransformerTest.java:106-762``), producing the expected final
table state.  The Spark engine's output must match this dict-replay
byte-for-byte (per-row content sha256 equality).

Engine op model (unifies the reference's config-driven insert.mode with the
graft's per-record ``op`` column):

- any null PK field  → errant record (``RowChangeTransformer.java:140-142``)
- tombstone (op=DELETE, i.e. null value in the reference,
  ``RowChangeTransformer.java:174-191``; decision ``:201-214``):
    delete.mode ∈ {row, row_and_column} → delete row
    else, insert.mode = put             → empty-row overwrite (RowPutChange
                                          with no columns — "覆盖写")
    else (insert.mode = update)         → errant (dirty record)
- op=PUT    → RowPutChange: full-row overwrite (absent columns dropped)
- op=UPDATE → RowUpdateChange: per-column partial update;
    null column + delete.mode ∈ {column, row_and_column} → delete column
    null column otherwise                                → ignored
    ALL columns null + delete.mode ∈ {none, row}         → errant
  UPDATE on a missing key creates the row (Tablestore UpdateRow upsert).
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable

from kafka_connect_tablestore_spark.config import DeleteMode, InsertMode, SinkConfig

ROW_DELETE_MODES = (DeleteMode.ROW, DeleteMode.ROW_AND_COLUMN)
COL_DELETE_MODES = (DeleteMode.COLUMN, DeleteMode.ROW_AND_COLUMN)


def sha256_hex(s: str | None) -> str | None:
    if s is None:
        return None
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def replay(
    events: Iterable[dict[str, Any]],
    config: SinkConfig,
    attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
    initial_state: dict[tuple, dict[str, Any]] | None = None,
) -> tuple[dict[tuple, dict[str, Any]], list[dict[str, Any]]]:
    """Replay ``events`` in (commit_ts, offset) order.

    Returns ``(state, dlq)`` where ``state`` maps pk-tuple → attribute dict
    and ``dlq`` lists errant events with an ``error_info`` field (mirroring
    the DLQ row layout of ``errors/TableStoreReporter.java:243-270``).
    """
    # tombstone detection is record-level (the reference checks value==null
    # BEFORE column projection), so it sees the FULL attribute set; the
    # whitelist only narrows what gets written
    full_attrs = tuple(attr_fields)
    if config.column_whitelist is not None:
        attr_fields = tuple(f for f in attr_fields if f in config.column_whitelist)
    state: dict[tuple, dict[str, Any]] = dict(initial_state or {})
    dlq: list[dict[str, Any]] = []

    def errant(ev: dict, msg: str) -> None:
        dlq.append({**ev, "error_info": msg})

    ordered = sorted(events, key=lambda e: (e["commit_ts"], e["offset"]))
    for ev in ordered:
        pk = tuple(ev.get(f) for f in config.pk_fields)
        if any(v is None for v in pk):
            errant(ev, "NULL_PRIMARY_KEY")
            continue
        op = ev.get("op")
        if op is None:
            tombstone = all(ev.get(f) is None for f in full_attrs)
            op = "DELETE" if tombstone else config.insert_mode.name
        elif op not in ("PUT", "UPDATE", "DELETE"):
            errant(ev, "UNKNOWN_OP")
            continue
        if op == "DELETE":
            if config.delete_mode in ROW_DELETE_MODES:
                state.pop(pk, None)
            elif config.insert_mode is InsertMode.PUT:
                # RowPutChange with no columns (RowChangeTransformer.java:209-210)
                state[pk] = {}
            else:
                errant(ev, "DELETE_NOT_ALLOWED")
            continue
        attrs = {f: ev.get(f) for f in attr_fields}
        if op == "PUT" and config.insert_mode is not InsertMode.UPDATE:
            # RowPutChange: full overwrite; null columns are simply absent.
            state[pk] = {f: v for f, v in attrs.items() if v is not None}
            continue
        # RowUpdateChange (op == UPDATE, or config forces update mode)
        if all(v is None for v in attrs.values()) and config.delete_mode not in COL_DELETE_MODES:
            errant(ev, "ALL_COLUMNS_NULL")
            continue
        row = state.setdefault(pk, {})
        for f, v in attrs.items():
            if v is not None:
                row[f] = v
            elif config.delete_mode in COL_DELETE_MODES:
                row.pop(f, None)
    return state, dlq


def state_rows(
    state: dict[tuple, dict[str, Any]],
    config: SinkConfig,
    attr_fields: tuple[str, ...] = ("commit", "lang", "content"),
) -> list[dict[str, Any]]:
    """Flatten oracle state to rows with the per-row sha256 invariant column."""
    rows = []
    for pk, attrs in state.items():
        row = dict(zip(config.pk_fields, pk))
        for f in attr_fields:
            row[f] = attrs.get(f)
        row["content_sha256"] = sha256_hex(row.get("content"))
        rows.append(row)
    rows.sort(key=lambda r: tuple(str(r[f]) for f in config.pk_fields))
    return rows
