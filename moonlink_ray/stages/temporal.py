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

    def sessions(bucket: pd.DataFrame) -> pd.DataFrame:
        b = bucket.sort_values([key_col, ts_col], kind="mergesort")
        # normalize to microseconds explicitly: depending on the
        # pyarrow->pandas conversion the column may arrive as
        # datetime64[ns] (coerce_temporal_nanoseconds), and a raw int64
        # view would then compare nanoseconds against a gap in micros
        ts = b[ts_col].astype("datetime64[us]").astype("int64")
        new_key = b[key_col].ne(b[key_col].shift())
        gap = ts.diff().gt(gap_us)
        start = (new_key | gap)
        # session ordinal per key: cumulative starts minus the count at
        # the key's first row
        sid_global = start.cumsum()
        first_of_key = sid_global.where(new_key).ffill()
        ordinal = (sid_global - first_of_key).astype(np.int64)
        out = b.drop(columns="_gb")
        out["session_id"] = b[key_col].astype(str) + "#" + ordinal.astype(str)
        return out

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("_gb").map_groups(sessions, batch_format="pandas")
