"""Fragment + deletion-vector sidecar IO.

Fragments are immutable Parquet files named ``frag-{run}-{part}-{n}`` so
that a resumed run regenerates *identical* file names (idempotent
writes; moonlink gets the same property from UUID files + atomic
catalog commit, ``iceberg_table_syncer.rs:176-310``). Stats are
per-fragment min/max zone maps on (image_id, phash, w, h) — the batch
replacement for moonlink's persisted hash file indices
(``src/moonlink/src/storage/index/persisted_bucket_hash_map.rs``): MERGE
prunes fragments by key range instead of probing an index.

Deletion vectors are sorted row positions stored as a tiny Parquet
sidecar (pos:int64), copy-on-write: a commit never mutates an existing
DV file, it writes a new cumulative one (mirrors the cumulative DV
puffin per commit, ``iceberg_table_syncer.rs:313-348``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fs import for_root
from .manifest import FragmentMeta

STATS_COLUMNS = ("image_id", "phash", "w", "h")
# Row-group size is tuned for wide binary rows: ~256 rows * ~3-60 KB ≈
# 1-16 MiB per row group, so a column-pruned read of just image_id never
# drags image bytes through memory.
ROW_GROUP_SIZE = 256

# FullRow-identity tables persist the 64-bit row hash as a hidden
# stored column, computed once at write time — the batch analog of
# moonlink building its hash index when a disk slice is written
# (``persisted_bucket_hash_map.rs``): MERGE's delete matching then
# reads ONLY this column instead of re-hashing whole rows (image bytes
# included) on every merge. Hidden: scans drop it unless explicitly
# requested.
ROWHASH_COL = "_rowhash"
_FULLROW_CACHE: dict[str, bool] = {}


def _is_fullrow(root: str) -> bool:
    got = _FULLROW_CACHE.get(root)
    if got is None:
        from .table_config import load_table_config
        got = _FULLROW_CACHE[root] = \
            load_table_config(root).identity.mode == "fullrow"
    return got


def _col_stats(table: pa.Table) -> dict[str, list]:
    stats: dict[str, list] = {}
    for col in STATS_COLUMNS:
        if col not in table.column_names or table.num_rows == 0:
            continue
        mm = pc.min_max(table[col])
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or hi is None:  # all-null column -> no zone map
            continue
        stats[col] = [lo, hi]
    return stats


def fragment_path(fragment_id: str) -> str:
    return f"fragments/{fragment_id}.parquet"


def write_fragment(root: str, table: pa.Table, fragment_id: str, *,
                   lineage: list[str] | None = None, max_lsn: int = 0,
                   zgen: str | None = None) -> FragmentMeta:
    """Write one immutable fragment and return its manifest entry."""
    fs = for_root(root)
    if ROWHASH_COL not in table.column_names and _is_fullrow(root):
        from .stages.keys import row_hash
        table = table.append_column(
            ROWHASH_COL, pa.array(row_hash(table), pa.int64()))
    keyfilter = None
    if ROWHASH_COL in table.column_names:
        # manifest-resident membership filter over the identity hashes:
        # FullRow fall-through deletes probe it instead of reading every
        # fragment's _rowhash column (see keyfilter module)
        from . import keyfilter as kf
        keyfilter = kf.build(
            table[ROWHASH_COL].to_numpy(zero_copy_only=False))
    rel = fragment_path(fragment_id)
    # image payloads are already codec-compressed: dictionary encoding
    # and snappy on the binary column only burn a write-path memory pass
    # (measured 2x write wall on 82 MB fragments); metadata columns are
    # too small for the codec choice to matter
    fs.write_parquet_atomic(table, rel, row_group_size=ROW_GROUP_SIZE,
                            compression="NONE", use_dictionary=False)
    return FragmentMeta(
        fragment_id=fragment_id,
        path=rel,
        rows=table.num_rows,
        size_bytes=fs.size(rel),
        stats=_col_stats(table),
        dv=None,
        lineage=sorted(lineage or []),
        max_lsn=max_lsn,
        zgen=zgen,
        keyfilter=keyfilter,
    )


def read_fragment(root: str, meta: FragmentMeta, columns: list[str] | None = None,
                  *, with_pos: bool = False, apply_dv: bool = True,
                  tolerant_columns: bool = False) -> pa.Table:
    """Read one fragment, optionally attaching ``_pos`` (row position in
    the fragment file) and filtering out DV-deleted rows.

    ``tolerant_columns``: skip requested columns the file predates (a
    fragment written before an ALTER ... ADD COLUMN lacks the new
    column; the schema-aware scan null-fills it afterwards)."""
    fs = for_root(root)
    if columns is not None and tolerant_columns:
        have = set(fs.parquet_schema(meta.path).names)
        columns = [c for c in columns if c in have]
    if meta.rg_span:
        # adopted-file fragment: the fragment is a row-group span of a
        # shared physical file (see FragmentMeta.rg_span)
        table = fs.read_parquet_span(meta.path, meta.rg_span,
                                     columns=columns)
    else:
        table = fs.read_parquet(meta.path, columns=columns)
    if columns is None:
        # hidden internal columns: the FullRow identity hash and the CDC
        # bookkeeping columns of adopted fragments (_op/_lsn/_seq/_xid).
        # Scans never surface them unless a caller asks by name.
        hidden = [c for c in table.column_names if c.startswith("_")]
        if hidden:
            table = table.drop_columns(hidden)
    if with_pos or (apply_dv and meta.dv):
        pos = np.arange(table.num_rows, dtype=np.int64)
        if apply_dv and meta.dv:
            dead = read_dv(root, meta.dv)
            mask = np.ones(table.num_rows, dtype=bool)
            mask[dead] = False
            table = table.filter(pa.array(mask))
            pos = pos[mask]
        if with_pos:
            table = table.append_column("_pos", pa.array(pos, type=pa.int64()))
    return table


def dv_path(dv_id: str) -> str:
    return f"dv/{dv_id}.parquet"


def write_dv(root: str, dv_id: str, positions: np.ndarray) -> dict:
    """Write a cumulative deletion vector sidecar; returns its manifest ref."""
    positions = np.unique(np.asarray(positions, dtype=np.int64))
    rel = dv_path(dv_id)
    for_root(root).write_parquet_atomic(pa.table({"pos": positions}), rel,
                                        compression="snappy")
    return {"path": rel, "count": int(len(positions))}


def read_dv(root: str, dv_ref: dict) -> np.ndarray:
    t = for_root(root).read_parquet(dv_ref["path"], columns=["pos"])
    return t["pos"].to_numpy()
