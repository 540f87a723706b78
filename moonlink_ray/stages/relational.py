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
                        count_col: str | None = "n"):
    """groupby(keys).sum(sum_cols) with per-batch pre-aggregation.

    All sum columns must be integer-typed (exact, order-insensitive —
    callers convert money to cents upstream). Returns Dataset with
    columns keys + sum_cols (+ count_col).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        gb = batch.groupby(keys, as_index=False)[sum_cols].sum()
        if count_col:
            cnt = batch.groupby(keys, as_index=False).size() \
                .rename(columns={"size": count_col})
            gb = gb.merge(cnt, on=keys)
        return gb

    partials = ds.map_batches(partial, batch_format="pandas")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    if count_col:
        aggs.append(Sum(count_col, alias_name=count_col))
    return partials.groupby(keys).aggregate(*aggs)


def broadcast_join(ds, small_ref, *, left_on: str, right_on: str,
                   how: str = "inner"):
    """Join ``ds`` against a broadcast pandas DataFrame (``ray.put`` it
    first). The classic small-dimension-table pattern."""
    import ray

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(small_ref)
        return batch.merge(small, left_on=left_on, right_on=right_on, how=how)

    return ds.map_batches(join, batch_format="pandas")


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
