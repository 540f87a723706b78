"""JSON row ingest: the batch analog of moonlink's REST/JSON row path.

Moonlink's REST API accepts JSON rows and converts them to typed table
rows with per-field validation before they enter the ingestion pipeline
(``/root/reference/src/moonlink_service/src/rest_api.rs:196-210``,
``src/moonlink/src/rest_ingest/json_converter.rs`` — field-by-field
decode with typed errors). Here the same contract is a Ray Data
pipeline: ``ray.data.read_json`` streams JSONL shards, a vectorized
validation/decode stage turns them into typed Arrow batches
(base64-decoded payloads, checked ops/LSNs), and the result feeds
either ``append_dataset`` (plain inserts) or ``merge`` (CDC upserts).

Validation semantics (mirroring the REST converter's strictness):
- required: ``image_id`` (str); for CDC also ``_op`` in
  {insert, upsert, delete} and ``_lsn`` (int);
- ``bytes`` is a base64 string in JSON (binary cannot ride raw JSON);
  deletes may omit all content fields;
- unknown fields are dropped (the active table schema decides);
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


class JsonRowError(ValueError):
    pass


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
    """map_batches callable: JSON-parsed rows -> typed CDC Arrow batch.

    Stateless and vectorized where the data allows (op/LSN checks are
    numpy; base64 decode is per-row because payloads are variable)."""

    def __init__(self, strict: bool = True, cdc: bool = True):
        self.strict = strict
        self.cdc = cdc
        self.__name__ = "JsonCdcParser"

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        names = set(batch.column_names)
        if "image_id" not in names:
            raise JsonRowError("missing required field image_id")
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

        blobs, dec_ok = [], np.ones(n, dtype=bool)
        have_bytes = "bytes" in names
        for i in range(n):
            if not ok[i]:
                blobs.append(None)
                continue
            raw = batch["bytes"][i].as_py() if have_bytes else None
            b, good = _decode_b64(raw, i, self.strict)
            blobs.append(b)
            dec_ok[i] = good
        ok &= dec_ok

        def col(name, typ, default=None):
            if name in names:
                return batch[name].cast(typ)
            return pa.nulls(n, typ) if default is None else \
                pa.array([default] * n, typ)

        out_schema = synth.CDC_SCHEMA if self.cdc else synth.IMAGES_SCHEMA
        cols = {
            "image_id": batch["image_id"].cast(pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": col("w", pa.int32()),
            "h": col("h", pa.int32()),
            "fmt": col("fmt", pa.string()),
            "caption": col("caption", pa.string()),
            "phash": col("phash", pa.int64()),
        }
        if self.cdc:
            cols["_op"] = batch["_op"].cast(pa.string())
            cols["_lsn"] = batch["_lsn"].cast(pa.int64())
            cols["_seq"] = col("_seq", pa.int64(), 0)
        t = pa.table({f.name: cols[f.name] for f in out_schema},
                     schema=out_schema)
        return t.filter(pa.array(ok)) if not ok.all() else t


def read_cdc_json(paths, *, strict: bool = True):
    """JSONL shard paths -> Dataset of typed CDC rows (streamed)."""
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.map_batches(JsonCdcParser(strict=strict, cdc=True),
                          batch_format="pyarrow")


def ingest_cdc_json(root: str, paths, *, run_id: str | None = None,
                    strict: bool = True):
    """Parse CDC JSONL and MERGE it into the table.

    The parsed stream is staged as a parquet CDC batch under the table's
    own tmp/ prefix (so merge's column-pruned key pass and its resume
    path work unchanged), then merged. Returns the new snapshot."""
    import uuid

    from ..fs import for_root
    from ..pipelines.merge import merge

    run_id = run_id or uuid.uuid4().hex[:12]
    fs = for_root(root)
    fs.makedirs("tmp")
    staged_rel = f"tmp/cdc-json-{run_id}.parquet"
    # CDC batches are small relative to the base table (same assumption
    # merge itself documents for its key pass), so staging via the
    # driver is bounded; a huge backfill would stage with
    # Dataset.write_parquet shards instead.
    tab = pa.concat_tables(
        b for b in read_cdc_json(paths, strict=strict)
        .iter_batches(batch_format="pyarrow"))
    fs.write_parquet_atomic(tab.cast(synth.CDC_SCHEMA), staged_rel)
    try:
        return merge(root, fs.full(staged_rel), run_id=run_id)
    finally:
        fs.delete(staged_rel)


def append_json(root: str, paths, *, strict: bool = True,
                run_id: str | None = None):
    """Parse plain-row JSONL and append as new fragments (REST insert
    analog, no key reconciliation)."""
    from ..bootstrap import append_dataset
    import ray.data as rd

    ds = rd.read_json(paths)
    ds = ds.map_batches(JsonCdcParser(strict=strict, cdc=False),
                        batch_format="pyarrow")
    return append_dataset(root, ds, run_id=run_id)
