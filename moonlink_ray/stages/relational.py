"""Relational operator helpers on Ray Data, shaped for scale.

- ``partial_groupby_sum``: the combiner pattern — aggregate inside each
  ``map_batches`` task first (one partial row per key per batch), then
  a global ``groupby`` over the much smaller partials. The all-to-all
  exchange moves per-key partials, not rows.
- ``broadcast_join``: small side is ``ray.put`` once and merged per
  batch inside ``map_batches`` — no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def partial_groupby_sum(ds, keys: list[str], sum_cols: list[str],
                        count_col: str | None = "n",
                        num_buckets: int = 64):
    """groupby(keys).sum(sum_cols) with per-batch pre-aggregation.

    All sum columns must be integer-typed (exact, order-insensitive —
    callers convert money to cents upstream); key columns must be
    non-null. Returns Dataset with columns keys + sum_cols (+
    count_col).

    Shape: Arrow ``Table.group_by`` inside each map_batches task (one
    partial row per key per batch — zero-copy, no pandas), then ONE
    exchange on ``hash(keys) % num_buckets`` folded per bucket with the
    same Arrow kernel. Ray's own ``groupby(keys).aggregate`` was
    measured 80x slower on high-cardinality composite keys (25.4 s vs
    0.3 s for 95k (user, window) partials at sf0.1) — its sort-based
    exchange sorts full key tuples, while the bucket exchange moves
    each partial row once and never sorts. The per-key partials bound
    the exchange at O(distinct keys per batch), the buckets bound the
    fold task state at O(distinct keys / num_buckets)."""
    def partial(batch: pa.Table) -> pa.Table:
        cols = keys + sum_cols
        t = batch.select(cols).append_column(
            "__one", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
        g = t.group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [("__one", "sum")])
        g = g.rename_columns(
            [n[:-4] if n.endswith("_sum") else n for n in g.column_names])
        h = pd.util.hash_pandas_object(
            g.select(keys).to_pandas(), index=False).to_numpy()
        return g.append_column(
            "_gb", pa.array((h % num_buckets).astype(np.int64)))

    def fold(bucket: pa.Table) -> pa.Table:
        g = bucket.group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [("__one", "sum")])
        g = g.rename_columns(
            [n[:-4] if n.endswith("_sum") else n for n in g.column_names])
        out_cols = keys + sum_cols + (["__one"] if count_col else [])
        g = g.select(out_cols)
        if count_col:
            g = g.rename_columns(out_cols[:-1] + [count_col])
        return g

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("_gb").map_groups(fold, batch_format="pyarrow")


def broadcast_join(ds, small_ref, *, left_on: str, right_on: str,
                   how: str = "inner"):
    """Join ``ds`` against a broadcast ``pyarrow.Table`` (``ray.put`` it
    first). The classic small-dimension-table pattern, zero-copy end to
    end: the probe is one ``pc.index_in`` per batch plus a ``take`` of
    the payload columns — no pandas conversion of the row stream.

    The build side's join keys must be UNIQUE (it is a dimension
    table); ``index_in`` returns the first match so duplicate build
    keys would silently drop rows a pandas merge would multiply."""
    import pyarrow.compute as pc
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, not {how!r}")

    def join(batch: pa.Table) -> pa.Table:
        small = ray.get(small_ref)          # pa.Table, plasma-shared
        if not isinstance(small, pa.Table):  # pandas build side: convert
            small = pa.Table.from_pandas(small, preserve_index=False)
        small = small.combine_chunks()
        idx = pc.index_in(batch[left_on], value_set=small[right_on])
        if how == "inner":
            keep = pc.is_valid(idx)
            batch, idx = batch.filter(keep), idx.filter(keep)
        for name in small.column_names:
            if name == right_on and name != left_on:
                continue        # key already present under left_on
            col = small[name].take(idx)     # null idx -> null (left join)
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, col)
            else:
                batch = batch.append_column(name, col)
        return batch

    return ds.map_batches(join, batch_format="pyarrow")


def semi_anti_filter(ds, key_set_ref, *, col: str, anti: bool = False):
    """Semi/anti join: broadcast the key set, filter inside map_batches."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        keys = ray.get(key_set_ref)  # sorted numpy array
        vals = batch[col].to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            mask = np.zeros(len(vals), dtype=bool)
        else:
            idx = np.searchsorted(keys, vals, side="left").clip(0, len(keys) - 1)
            mask = keys[idx] == vals
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")
