"""Temporal operators: as-of join and gap-based sessionization.

Both are streaming-engine staples moonlink doesn't expose (it is an
ingestion engine); they are part of this repo's training-data operator
surface (SURVEY.md §2.10).

- **as-of join**: every left row matched to the most recent right row
  (same key, right.ts <= left.ts). Right side is broadcast via
  ``ray.put`` (dimension-table sized); the match is a zero-copy Arrow
  kernel (``_asof_indices``): factorize keys over the union, rank-
  compress timestamps, ONE ``np.searchsorted`` over a (key, ts)
  composite — no pandas conversion of the row stream, no shuffle.
  At 10^12 left rows the broadcast side is the small one by
  construction; a two-big-sides as-of buckets both sides on key
  hashes first (``asof_join_bucketed``, same _GB_BUCKETS pattern as
  dedup) and runs the same kernel once per bucket.
- **sessionize**: assign gap-based session ids per key. Shuffles once
  on hash(key) % num_buckets, then ONE vectorized pandas callback per
  bucket (sort + diff + cumsum — no per-key Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _ts_int64(col) -> np.ndarray:
    """Orderable int64 view of a timestamp/date/numeric Arrow column,
    normalized to microseconds for temporal types."""
    import pyarrow as pa
    import pyarrow.compute as pc
    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64()).to_numpy(zero_copy_only=False)


def _asof_indices(code_l: np.ndarray, t_l: np.ndarray,
                  code_r: np.ndarray, t_r: np.ndarray) -> np.ndarray:
    """For each left row: index into the RIGHT arrays of the last row
    with the same key code and ``t_r <= t_l`` (ties -> last in original
    right order, matching ``pandas.merge_asof``), or -1.

    Fully vectorized: stable-sort right by (code, t, original pos),
    rank-compress timestamps over the union of both sides, then a
    single ``searchsorted`` over the ``code * M + rank`` composite —
    no per-key or per-row Python.
    """
    nl, nr = len(code_l), len(code_r)
    out = np.full(nl, -1, dtype=np.int64)
    if nl == 0 or nr == 0:
        return out
    order = np.lexsort((np.arange(nr), t_r, code_r))
    cr = code_r[order]
    tr = t_r[order]
    uniq = np.unique(np.concatenate([tr, t_l]))
    rr = np.searchsorted(uniq, tr)
    rl = np.searchsorted(uniq, t_l)
    # composite fits int64: codes and ranks are both bounded by the
    # bucket's row count (rank-compressed), so the product is << 2^63
    M = np.int64(len(uniq) + 1)
    pos = np.searchsorted(cr * M + rr, code_l * M + rl, side="right") - 1
    safe = np.clip(pos, 0, None)
    valid = (pos >= 0) & (cr[safe] == code_l)
    out[valid] = order[safe[valid]]
    return out


def _asof_join_tables(lt, rt, *, left_on: str, right_on: str,
                      by_left: str, by_right: str):
    """Arrow-native as-of join of two pyarrow Tables: left columns +
    right columns (right ones NULL when no right row at or before the
    left row's timestamp). A right column whose name equals the left
    by-key is dropped (it is equal by construction); any other name
    collision gets an ``_r`` suffix."""
    import pyarrow as pa
    import pyarrow.compute as pc

    kl = np.asarray(lt[by_left].to_numpy(zero_copy_only=False))
    kr = np.asarray(rt[by_right].to_numpy(zero_copy_only=False))
    # null by-keys never match (pandas merge_asof semantics): factorize
    # only non-null keys — a None in an object array would crash
    # np.unique's sort — and leave null-key left rows unmatched
    null_l = pc.is_null(lt[by_left]).to_numpy(zero_copy_only=False)
    null_r = pc.is_null(rt[by_right]).to_numpy(zero_copy_only=False)
    if rt.num_rows and not null_r.all():
        pool = np.concatenate([kl[~null_l], kr[~null_r]])
        uniq = np.unique(pool)
        idx = np.full(lt.num_rows, -1, dtype=np.int64)
        code_l = np.searchsorted(uniq, kl[~null_l])
        code_r = np.searchsorted(uniq, kr[~null_r])
        r_pos = np.flatnonzero(~null_r)
        sub = _asof_indices(
            code_l, _ts_int64(lt[left_on])[~null_l],
            code_r, _ts_int64(rt[right_on])[~null_r])
        idx[~null_l] = np.where(sub >= 0, r_pos[np.clip(sub, 0, None)], -1)
    else:
        idx = np.full(lt.num_rows, -1, dtype=np.int64)
    take = pa.array(idx, pa.int64(), mask=idx < 0)  # null -> null row

    names = list(lt.column_names)
    cols = list(lt.columns)
    left_names = set(names)
    for rname in rt.column_names:
        if rname == by_left and by_right == by_left:
            continue
        out_name = rname + "_r" if rname in left_names else rname
        names.append(out_name)
        cols.append(pc.take(rt[rname], take))
    return pa.table(cols, names=names)


def asof_join(ds, right_ref, *, left_on: str, right_on: str, by_left: str,
              by_right: str, right_cols: list[str]):
    """Left as-of join against a broadcast right table.

    ``right_ref`` is ``ray.put`` of a pandas DataFrame or pyarrow Table
    with columns [by_right, right_on, *right_cols]. Returns left
    columns + right columns (null when no right row precedes the left
    row). The left stream stays zero-copy Arrow end-to-end.
    """
    import pyarrow as pa
    import ray

    def join(batch: pa.Table) -> pa.Table:
        right = ray.get(right_ref)
        if not isinstance(right, pa.Table):
            right = pa.Table.from_pandas(right, preserve_index=False)
        return _asof_join_tables(batch, right, left_on=left_on,
                                 right_on=right_on, by_left=by_left,
                                 by_right=by_right)

    return ds.map_batches(join, batch_format="pyarrow")


def asof_join_bucketed(left, right, *, left_on: str, right_on: str,
                       by_left: str, by_right: str,
                       left_schema, right_schema,
                       num_buckets: int = 64):
    """Two-big-sides as-of join: NEITHER side is broadcast or
    driver-materialized. Both sides exchange once on
    ``hash(key) % num_buckets`` (tagged with typed null-fill for the
    other side's columns, union'ed, grouped), then the vectorized
    Arrow as-of kernel (``_asof_join_tables``) runs once per bucket. This is the scale path when
    the right side is not a dimension table (e.g. events as-of orders,
    both at table scale); per-bucket state is bounded by the bucket's
    share of both sides, and skewed keys can be salted the same way as
    the dedup exchanges.

    ``left_schema`` / ``right_schema`` are pyarrow schemas of exactly
    the columns each side contributes (disjoint names; timestamps as
    timestamp[us]). Returns left columns + right columns (right ones
    null when no right row at or before the left row's timestamp).
    """
    import pyarrow as pa

    all_fields = list(left_schema) + list(right_schema)

    def tag(side: int, by_col: str, own: "pa.Schema"):
        own_names = set(own.names)

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for f in all_fields:
                if f.name in own_names:
                    cols.append(t[f.name].cast(f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            key = t[by_col].to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(np.asarray(key, dtype=object))
            names = [f.name for f in all_fields] + ["_gb", "_side"]
            cols.append(pa.array((h % num_buckets).astype(np.int64)))
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.table(cols, names=names)

        fn.__name__ = f"asof_tag_{'left' if side else 'right'}"
        return fn

    lt = left.map_batches(tag(1, by_left, left_schema),
                          batch_format="pyarrow")
    rt = right.map_batches(tag(0, by_right, right_schema),
                           batch_format="pyarrow")
    both = lt.union(rt)
    right_names = list(right_schema.names)
    left_names = list(left_schema.names)

    def join(bucket: pa.Table) -> pa.Table:
        # the side filter restores null-free typed columns on each
        # side (tag cast them to their declared schema types), so the
        # Arrow kernel needs no dtype repair
        side = bucket["_side"].to_numpy(zero_copy_only=False)
        l = bucket.filter(pa.array(side == 1)).select(left_names)
        r = bucket.filter(pa.array(side == 0)).select(right_names)
        return _asof_join_tables(l, r, left_on=left_on, right_on=right_on,
                                 by_left=by_left, by_right=by_right)

    return both.groupby("_gb").map_groups(join, batch_format="pyarrow")


def sessionize(ds, *, key_col: str, ts_col: str, gap_us: int,
               num_buckets: int = 64):
    """Gap-based sessions: rows of one key whose successive timestamps
    differ by more than ``gap_us`` microseconds start a new session.
    Output: input columns + ``session_id`` (= f"{key}#{n}" with n the
    0-based session ordinal per key, in time order)."""
    import pyarrow as pa

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.asarray(batch[key_col].to_numpy(zero_copy_only=False),
                       dtype=object))
        return batch.append_column(
            "_gb", pa.array((h % num_buckets).astype(np.int64), pa.int64()))

    import pyarrow.compute as pc

    def sessions(bucket: "pa.Table") -> "pa.Table":
        # Arrow-native fold: one sort + numpy scans, no pandas copies
        b = bucket.take(pc.sort_indices(
            bucket, sort_keys=[(key_col, "ascending"),
                               (ts_col, "ascending")]))
        # normalize to microseconds explicitly so the gap compares in
        # the unit it is specified in
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        key = b[key_col].to_numpy(zero_copy_only=False)
        n = len(ts)
        new_key = np.r_[True, key[1:] != key[:-1]] if n else \
            np.zeros(0, dtype=bool)
        gap = np.r_[False, (ts[1:] - ts[:-1]) > gap_us] if n else new_key
        sid = np.cumsum(new_key | gap)
        # session ordinal per key = sid minus sid at the key's first row
        first_idx = np.maximum.accumulate(
            np.where(new_key, np.arange(n), 0)) if n else new_key
        ordinal = sid - sid[first_idx] if n else np.zeros(0, np.int64)
        b = b.drop_columns(["_gb"])
        sid_str = pc.binary_join_element_wise(
            pc.cast(b[key_col], pa.string()),
            pc.cast(pa.array(ordinal), pa.string()), "#")
        return b.append_column("session_id", sid_str)

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("_gb").map_groups(sessions,
                                              batch_format="pyarrow")
