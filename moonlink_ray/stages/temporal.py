"""Temporal operators: as-of join and gap-based sessionization.

Both are streaming-engine staples moonlink doesn't expose (it is an
ingestion engine); they are part of this repo's training-data operator
surface (SURVEY.md §2.10).

- **as-of join**: every left row matched to the most recent right row
  (same key, right.ts <= left.ts). Right side is broadcast via
  ``ray.put`` (dimension-table sized); the per-batch match is
  ``pandas.merge_asof(by=key)`` — vectorized binary search, no shuffle.
  At 10^12 left rows the broadcast side is the small one by
  construction; a two-big-sides as-of would bucket both sides on key
  ranges first (same _GB_BUCKETS pattern as dedup).
- **sessionize**: assign gap-based session ids per key. Shuffles once
  on hash(key) % num_buckets, then ONE vectorized pandas callback per
  bucket (sort + diff + cumsum — no per-key Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def asof_join(ds, right_ref, *, left_on: str, right_on: str, by_left: str,
              by_right: str, right_cols: list[str]):
    """Left as-of join against a broadcast right DataFrame.

    ``right_ref`` is ``ray.put(df)`` where df has columns
    [by_right, right_on, *right_cols]. Returns left columns +
    right_cols (NaN/None when no right row precedes the left row).
    """
    import ray

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(right_ref)
        right = right.sort_values([right_on, by_right], kind="mergesort")
        b = batch.sort_values([left_on, by_left], kind="mergesort")
        out = pd.merge_asof(b, right, left_on=left_on, right_on=right_on,
                            left_by=by_left, right_by=by_right,
                            suffixes=("", "_r"))
        return out

    return ds.map_batches(join, batch_format="pandas")


def asof_join_bucketed(left, right, *, left_on: str, right_on: str,
                       by_left: str, by_right: str,
                       left_schema, right_schema,
                       num_buckets: int = 64):
    """Two-big-sides as-of join: NEITHER side is broadcast or
    driver-materialized. Both sides exchange once on
    ``hash(key) % num_buckets`` (tagged with typed null-fill for the
    other side's columns, union'ed, grouped), then ONE vectorized
    ``pandas.merge_asof`` runs per bucket. This is the scale path when
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

    def _restore(df: pd.DataFrame, schema) -> pd.DataFrame:
        # after the side filter, own columns are null-free again — undo
        # the union's null-driven upcasts (int64 -> float64) so the
        # merge keys match dtypes on both sides
        import pyarrow as pa
        for f in schema:
            if pa.types.is_integer(f.type):
                df[f.name] = df[f.name].astype(np.int64)
        return df

    def join(bucket: pd.DataFrame) -> pd.DataFrame:
        l = _restore(bucket.loc[bucket["_side"] == 1, left_names].copy(),
                     left_schema) \
            .sort_values([left_on, by_left], kind="mergesort")
        r = _restore(bucket.loc[bucket["_side"] == 0, right_names].copy(),
                     right_schema)
        if len(r) == 0:
            out = l.copy()
            for f in right_schema:
                out[f.name] = pd.Series([None] * len(out), index=out.index)
            return out
        r = r.sort_values([right_on, by_right], kind="mergesort")
        return pd.merge_asof(l, r, left_on=left_on, right_on=right_on,
                             left_by=by_left, right_by=by_right,
                             suffixes=("", "_r"))

    return both.groupby("_gb").map_groups(join, batch_format="pandas")


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
