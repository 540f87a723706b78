"""JSON row ingest: the batch analog of moonlink's REST/JSON row path.

Moonlink's REST API accepts JSON rows and converts them to typed table
rows with per-field validation before they enter the ingestion pipeline
(``/root/reference/src/moonlink_service/src/rest_api.rs:196-210``,
``src/moonlink/src/rest_ingest/json_converter.rs:34-200`` —
field-by-field decode with typed errors, incl. numerics, datetimes and
decimal validation). Here the same contract is a Ray Data pipeline:
``ray.data.read_json`` streams JSONL shards, a vectorized
validation/decode stage turns them into typed Arrow batches conforming
to the table's ACTIVE schema (so a column added by ALTER ingests, and a
dropped one is rejected/dropped per strictness), and the result feeds
either ``append_dataset`` (plain inserts) or ``merge`` (CDC upserts).

Validation semantics (mirroring the REST converter's strictness):
- required: ``image_id`` (str); for CDC also ``_op`` in
  {insert, upsert, delete} and ``_lsn`` (int);
- typed conversion per schema column: strings/ints/floats/bools cast
  with overflow/lossy-cast errors surfaced; ``timestamp[us]`` parses
  ISO-8601 strings; ``binary`` columns are base64 strings in JSON
  (binary cannot ride raw JSON); ``decimal128`` accepts JSON strings
  only (validated against precision/scale); ``list<T>`` and
  ``struct<...>`` convert recursively — struct fields match by name,
  absent fields null-fill, extra fields follow the strictness rule of
  the leaf cast; deletes may omit content fields;
- fields absent from a row are null-filled; fields not in the active
  schema (never-declared or ALTER-dropped) raise in ``strict`` mode and
  are silently dropped otherwise;
- ``strict=True`` raises on the first bad row (with its index);
  ``strict=False`` drops bad rows — the REST path's per-row 4xx.
"""

from __future__ import annotations

import base64
import binascii

import numpy as np
import pyarrow as pa

from .. import synth

_OPS = ("insert", "upsert", "delete")
_CDC_EXTRA = (("_op", pa.string()), ("_lsn", pa.int64()), ("_seq", pa.int64()))


class JsonRowError(ValueError):
    pass


def _has_decimal(t: pa.DataType) -> bool:
    if pa.types.is_decimal(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _has_decimal(t.value_type)
    if pa.types.is_struct(t):
        return any(_has_decimal(f.type) for f in t)
    return False


def _decimal_src_ok(src: pa.DataType, dst: pa.DataType) -> bool:
    """Decimal targets must be fed JSON strings (the reference's
    converter rejects JSON numbers for Decimal128 outright —
    json_converter.rs:133-146 — because a binary float has no exact
    decimal identity). Checked recursively through list and struct
    nesting."""
    if pa.types.is_decimal(dst):
        return (pa.types.is_string(src) or pa.types.is_large_string(src)
                or pa.types.is_null(src) or pa.types.is_decimal(src))
    if (pa.types.is_list(dst) or pa.types.is_large_list(dst)) and (
            pa.types.is_list(src) or pa.types.is_large_list(src)):
        return _decimal_src_ok(src.value_type, dst.value_type)
    if pa.types.is_struct(dst) and pa.types.is_struct(src):
        by_name = {f.name: f.type for f in src}
        return all(_decimal_src_ok(by_name[f.name], f.type)
                   for f in dst if f.name in by_name)
    return True


def _restructure(arr: pa.Array, dst: pa.DataType) -> pa.Array:
    """Align a JSON-inferred nested array to the target's SHAPE (not
    yet its leaf types): struct children are matched by name — missing
    children null-fill, extra children drop — recursively through
    lists. Arrow's cast then handles leaf conversion; on its own it
    refuses structs whose field sets differ (the JSON reader only
    infers fields that appear), so rows that omit optional struct
    fields would be unconvertible without this. The reference's
    converter walks nested fields the same way
    (json_converter.rs:34-200: field-by-field decode with null-fill
    for absent fields)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    src = arr.type
    if pa.types.is_struct(dst):
        if pa.types.is_null(src):
            return arr  # cast null -> struct null-fills directly
        if not pa.types.is_struct(src):
            raise pa.ArrowTypeError(f"cannot restructure {src} as {dst}")
        have = {f.name: i for i, f in enumerate(src)}
        children = []
        for f in dst:
            if f.name in have:
                children.append(_restructure(arr.field(have[f.name]),
                                             f.type))
            else:
                children.append(pa.nulls(len(arr), f.type))
        return pa.StructArray.from_arrays(
            children, names=[f.name for f in dst],
            mask=arr.is_null() if arr.null_count else None)
    if pa.types.is_list(dst) and (pa.types.is_list(src)
                                  or pa.types.is_large_list(src)):
        if pa.types.is_large_list(src):
            arr = arr.cast(pa.list_(src.value_type))
        values = _restructure(arr.values, dst.value_type)
        return pa.ListArray.from_arrays(
            arr.offsets, values,
            mask=arr.is_null() if arr.null_count else None)
    return arr


def _needs_restructure(t: pa.DataType) -> bool:
    if pa.types.is_struct(t):
        return True
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _needs_restructure(t.value_type)
    return False


def _decode_b64(val, i: int, strict: bool):
    if val is None:
        return None, True
    try:
        return base64.b64decode(val, validate=True), True
    except (binascii.Error, TypeError):
        if strict:
            raise JsonRowError(f"row {i}: bytes is not valid base64")
        return None, False


class JsonCdcParser:
    """map_batches callable: JSON-parsed rows -> typed Arrow batch
    conforming to the table's active schema.

    Stateless and vectorized where the data allows (op/LSN checks are
    numpy, typed casts are Arrow kernels; base64 decode is per-row
    because payloads are variable)."""

    def __init__(self, strict: bool = True, cdc: bool = True,
                 schema_list: list | None = None):
        from ..schema import schema_from_list
        self.strict = strict
        self.cdc = cdc
        self.schema = schema_from_list(schema_list) or synth.IMAGES_SCHEMA
        self.__name__ = "JsonCdcParser"

    def _typed(self, batch: pa.Table, field: pa.Field, ok: np.ndarray):
        """Column for one schema field: null-fill if absent, else typed
        conversion; tolerant mode marks inconvertible rows in ``ok``."""
        n = batch.num_rows
        if field.name not in batch.column_names:
            return pa.nulls(n, field.type)
        col = batch[field.name]
        src = col.type
        if _has_decimal(field.type) and not _decimal_src_ok(src, field.type):
            if self.strict:
                raise JsonRowError(
                    f"column {field.name}: decimal values must be JSON "
                    f"strings, got {src} (json_converter.rs TypeMismatch)")
            # tolerant: only all-null rows of the wrong-typed column keep
            # their row; any actual value is inconvertible by contract
            present = np.array([v is not None for v in col.to_pylist()])
            ok &= ~present
            return pa.nulls(n, field.type)
        if pa.types.is_timestamp(field.type) and (
                pa.types.is_string(src) or pa.types.is_large_string(src)):
            pass  # Arrow's string->timestamp cast parses ISO-8601
        try:
            if _needs_restructure(field.type):
                col = _restructure(
                    col if isinstance(col, pa.ChunkedArray)
                    else pa.chunked_array([col]), field.type)
            return col.cast(field.type)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
                pa.ArrowTypeError) as e:
            if self.strict:
                raise JsonRowError(
                    f"column {field.name}: cannot convert {src} -> "
                    f"{field.type}: {e}") from None
        # tolerant slow path: per-row SAFE cast (pa.scalar would truncate
        # lossy numerics silently), bad rows masked out
        vals = []
        nested = _needs_restructure(field.type)
        for i, v in enumerate(col.to_pylist()):
            try:
                if nested:
                    # build at the row's own inferred shape, align the
                    # struct/list skeleton, then SAFE-cast the leaves —
                    # pa.array straight at the target type would
                    # truncate lossy numerics silently
                    a = _restructure(pa.array([v]), field.type)
                    vals.append(a.cast(field.type)[0].as_py())
                else:
                    vals.append(
                        pa.array([v], src).cast(field.type)[0].as_py())
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError,
                    ValueError):
                vals.append(None)
                ok[i] = False
        return pa.array(vals, field.type)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = set(batch.column_names)
        if "image_id" not in names:
            raise JsonRowError("missing required field image_id")
        allowed = {f.name for f in self.schema} | {c for c, _ in _CDC_EXTRA}
        unknown = sorted(names - allowed)
        if unknown and self.strict:
            raise JsonRowError(
                f"field(s) {unknown} not in the active table schema "
                f"(never declared, or removed by ALTER ... DROP)")
        ok = np.ones(n, dtype=bool)
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        bad = np.array([x is None or not isinstance(x, str) for x in ids])
        if bad.any():
            if self.strict:
                raise JsonRowError(
                    f"row {int(np.flatnonzero(bad)[0])}: bad image_id")
            ok &= ~bad

        if self.cdc:
            for col in ("_op", "_lsn"):
                if col not in names:
                    raise JsonRowError(f"missing required CDC field {col}")
            ops = batch["_op"].to_numpy(zero_copy_only=False)
            bad = ~np.isin(ops, _OPS)
            if bad.any():
                if self.strict:
                    i = int(np.flatnonzero(bad)[0])
                    raise JsonRowError(f"row {i}: bad _op {ops[i]!r}")
                ok &= ~bad
            lsn = batch["_lsn"].to_numpy(zero_copy_only=False)
            bad = np.array([x is None for x in lsn])
            if bad.any():
                if self.strict:
                    raise JsonRowError(
                        f"row {int(np.flatnonzero(bad)[0])}: missing _lsn")
                ok &= ~bad

        cols: dict = {}
        out_fields: list[pa.Field] = []
        for f in self.schema:
            out_fields.append(f)
            if f.name == "image_id":
                cols[f.name] = batch[f.name].cast(pa.string())
            elif pa.types.is_binary(f.type):
                blobs, dec_ok = [], np.ones(n, dtype=bool)
                have = f.name in names
                for i in range(n):
                    if not ok[i]:
                        blobs.append(None)
                        continue
                    raw = batch[f.name][i].as_py() if have else None
                    b, good = _decode_b64(raw, i, self.strict)
                    blobs.append(b)
                    dec_ok[i] = good
                ok &= dec_ok
                cols[f.name] = pa.array(blobs, f.type)
            else:
                cols[f.name] = self._typed(batch, f, ok)
        if self.cdc:
            cols["_op"] = batch["_op"].cast(pa.string())
            cols["_lsn"] = batch["_lsn"].cast(pa.int64())
            cols["_seq"] = (batch["_seq"].cast(pa.int64())
                            if "_seq" in names
                            else pa.array([0] * n, pa.int64()))
            out_fields += [pa.field(c, t) for c, t in _CDC_EXTRA]
        out_schema = pa.schema(out_fields)
        t = pa.table({f.name: cols[f.name] for f in out_schema},
                     schema=out_schema)
        return t.filter(pa.array(ok)) if not ok.all() else t


def read_cdc_json(paths, *, strict: bool = True,
                  schema_list: list | None = None):
    """JSONL shard paths -> Dataset of typed CDC rows (streamed)."""
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.map_batches(JsonCdcParser(strict=strict, cdc=True,
                                        schema_list=schema_list),
                          batch_format="pyarrow")


def ingest_cdc_json(root: str, paths, *, run_id: str | None = None,
                    strict: bool = True):
    """Parse CDC JSONL and MERGE it into the table.

    The parsed stream is staged as parquet CDC shards under the table's
    own tmp/ prefix via ``Dataset.write_parquet`` (one shard per block —
    nothing is collected to the driver, so an arbitrarily large backfill
    streams), then merged. Returns the new snapshot."""
    import uuid

    from ..fs import for_root
    from ..manifest import load
    from ..pipelines.merge import merge

    run_id = run_id or uuid.uuid4().hex[:12]
    fs = for_root(root)
    staged_rel = f"tmp/cdc-json-{run_id}"
    fs.makedirs(staged_rel)
    ds = read_cdc_json(paths, strict=strict, schema_list=load(root).schema)
    ds.write_parquet(fs.full(staged_rel), filesystem=fs.fs)
    shards = [fs.full(f"{staged_rel}/{name}")
              for name in fs.listdir(staged_rel) if name.endswith(".parquet")]
    try:
        if not shards:  # every row dropped (tolerant mode) -> no-op
            return load(root)
        return merge(root, shards, run_id=run_id)
    finally:
        fs.delete_dir(staged_rel)


def append_json(root: str, paths, *, strict: bool = True,
                run_id: str | None = None):
    """Parse plain-row JSONL and append as new fragments (REST insert
    analog, no key reconciliation)."""
    from ..bootstrap import append_dataset
    from ..manifest import load
    import ray.data as rd

    ds = rd.read_json(paths)
    ds = ds.map_batches(JsonCdcParser(strict=strict, cdc=False,
                                      schema_list=load(root).schema),
                        batch_format="pyarrow")
    return append_dataset(root, ds, run_id=run_id)
