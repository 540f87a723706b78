"""Schema evolution: add/drop columns as metadata-only commits.

The moonlink analog is ``AlterTableRequest {new_columns,
dropped_columns}`` applied through the table-handler gate
(``/root/reference/src/moonlink/src/storage/mooncake_table.rs:96-123``,
gating at ``:572-607``). In this engine the active schema lives in the
snapshot descriptor: an ALTER writes a new snapshot with the same
fragment list and an updated schema — no data file is touched.
Projection-on-read conforms every fragment to the reading snapshot's
schema: columns added after a fragment was written are null-filled,
dropped columns are projected away even though old immutable fragments
still contain them. Snapshot isolation therefore extends to schema: a
reader at version S sees S's columns, before and after any later ALTER.
"""

from __future__ import annotations

import pyarrow as pa

from .manifest import Snapshot, commit, load
from .synth import IMAGES_SCHEMA

# serializable type vocabulary for snapshot descriptors. Beyond the
# scalar names below, four PARAMETRIC forms mirror the breadth of
# moonlink's REST JSON converter (``rest_ingest/json_converter.rs:
# 34-200`` + ``decimal_utils.rs``: decimals with validation, date/time,
# nested lists and structs): ``decimal128(p,s)``, ``decimal128(p)``,
# ``list<T>`` and ``struct<name:T,...>`` for any vocabulary element T,
# nested arbitrarily.
_TYPES = {
    "string": pa.string(),
    "binary": pa.binary(),
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "timestamp[us]": pa.timestamp("us"),
    "date32": pa.date32(),
    "time64[us]": pa.time64("us"),
}
_TYPE_NAMES = {v: k for k, v in _TYPES.items()}

# columns the engine itself depends on: the MERGE/dedup key, the image
# payload, and the Z-order key components (keys.py zkey inputs)
PROTECTED_COLUMNS = ("image_id", "bytes", "phash", "w", "h")


def _split_top(body: str, sep: str) -> list[str]:
    """Split ``body`` on ``sep`` at angle-bracket/paren depth 0 only —
    nested ``list<struct<a:int64,b:string>>`` commas stay intact."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return parts


def type_from_name(name: str) -> pa.DataType:
    got = _TYPES.get(name)
    if got is not None:
        return got
    if name.startswith("list<") and name.endswith(">"):
        return pa.list_(type_from_name(name[5:-1]))
    if name.startswith("struct<") and name.endswith(">"):
        fields = []
        for part in _split_top(name[7:-1], ","):
            nm, _, tn = part.partition(":")
            if not nm or not tn:
                raise ValueError(f"bad struct field {part!r} in {name!r}; "
                                 f"expected name:type")
            fields.append(pa.field(nm, type_from_name(tn)))
        if not fields:
            raise ValueError(f"struct type needs at least one field: "
                             f"{name!r}")
        return pa.struct(fields)
    if name.startswith("decimal128(") and name.endswith(")"):
        body = name[len("decimal128("):-1]
        try:
            parts = [int(p) for p in body.split(",")]
            if len(parts) == 1:
                return pa.decimal128(parts[0])
            if len(parts) == 2:
                return pa.decimal128(parts[0], parts[1])
        except ValueError:
            pass
        raise ValueError(f"bad decimal128 parameters in {name!r}; "
                         f"expected decimal128(precision[,scale])")
    raise ValueError(f"unsupported column type {name!r}; "
                     f"one of {sorted(_TYPES)}, decimal128(p[,s]), "
                     f"list<T>, or struct<name:T,...>")


def type_to_name(t: pa.DataType) -> str:
    got = _TYPE_NAMES.get(t)
    if got is not None:
        return got
    if pa.types.is_list(t):
        return f"list<{type_to_name(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_to_name(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_decimal128(t):
        return f"decimal128({t.precision},{t.scale})"
    raise ValueError(f"type {t} has no serializable name")


def schema_to_list(schema: pa.Schema) -> list[list[str]]:
    return [[f.name, type_to_name(f.type)] for f in schema]


def schema_from_list(lst: list | None) -> pa.Schema | None:
    if lst is None:
        return None
    return pa.schema([(n, type_from_name(t)) for n, t in lst])


def table_schema(snap: Snapshot) -> pa.Schema:
    """The active schema of a snapshot (pre-evolution snapshots carry
    none and default to the bootstrap image schema)."""
    return schema_from_list(snap.schema) or IMAGES_SCHEMA


def conform_table(t: pa.Table, schema: pa.Schema,
                  keep_extra: tuple[str, ...] = ("_pos", "_frag")) -> pa.Table:
    """Project a fragment table onto ``schema``: null-fill columns the
    fragment predates, drop columns the schema no longer has (internal
    scan columns in ``keep_extra`` survive), order per schema."""
    cols, names = [], []
    for f in schema:
        if f.name in t.column_names:
            cols.append(t[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, f.type))
        names.append(f.name)
    for extra in keep_extra:
        if extra in t.column_names:
            cols.append(t[extra])
            names.append(extra)
    return pa.table(dict(zip(names, cols)))


def alter_table(root: str, *, add: list[tuple[str, str]] | None = None,
                drop: list[str] | None = None) -> Snapshot:
    """Commit a schema change (metadata only; fragments untouched).

    ``add``: [(name, type_name)] appended to the schema, null-filled on
    read for every pre-existing fragment. ``drop``: column names removed
    from the schema (projection-on-read hides them). Gated like the
    reference's alter path: duplicate adds, unknown drops, and drops of
    engine-critical columns (key / payload / cluster-key components)
    are rejected before anything is written.
    """
    add = list(add or [])
    drop = list(drop or [])
    if not add and not drop:
        raise ValueError("alter_table: nothing to do")
    snap = load(root)
    fields = list(table_schema(snap))
    names = [f.name for f in fields]
    for col in drop:
        if col in PROTECTED_COLUMNS:
            raise ValueError(f"cannot drop engine column {col!r}")
        if col not in names:
            raise ValueError(f"cannot drop unknown column {col!r}")
    for name, _ in add:
        if name in names or name in [a for a, _ in add if a != name]:
            raise ValueError(f"column {name!r} already exists")
    new_fields = [f for f in fields if f.name not in drop]
    new_fields += [pa.field(n, type_from_name(t)) for n, t in add]
    new_schema = pa.schema(new_fields)
    return commit(root, snap.fragments, max_lsn=snap.max_lsn,
                  job={"kind": "alter", "add": [[n, t] for n, t in add],
                       "drop": sorted(drop)},
                  schema=schema_to_list(new_schema),
                  expected_parent=snap.version)
