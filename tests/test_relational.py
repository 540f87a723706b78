"""Relational helper stages: partial aggregation, broadcast join,
semi/anti filters (the no-shuffle patterns the query registry uses)."""

import numpy as np
import pandas as pd
import pytest

from moonlink_ray.stages.relational import (broadcast_join,
                                            partial_groupby_sum,
                                            semi_anti_filter)


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows)


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_partial_groupby_sum(self):
        rows = [{"k": i % 3, "v": i} for i in range(100)]
        out = partial_groupby_sum(_ds(rows), ["k"], ["v"]).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        ref = pd.DataFrame(rows).groupby("k", as_index=False) \
            .agg(v=("v", "sum"), n=("v", "size"))
        assert list(out["v"]) == list(ref["v"])
        assert list(out["n"]) == list(ref["n"])

    def test_broadcast_join_inner(self):
        import ray
        small = pd.DataFrame({"k": [0, 1], "name": ["a", "b"]})
        ref = ray.put(small)
        rows = [{"k": i % 3, "v": i} for i in range(9)]
        out = broadcast_join(_ds(rows), ref, left_on="k", right_on="k") \
            .to_pandas()
        assert len(out) == 6          # k==2 rows dropped (inner)
        assert set(out["name"]) == {"a", "b"}

    def test_semi_and_anti_filter(self):
        import ray
        keys = ray.put(np.array([1, 3, 5]))
        rows = [{"k": i, "v": i * 10} for i in range(8)]
        semi = semi_anti_filter(_ds(rows), keys, col="k").to_pandas()
        anti = semi_anti_filter(_ds(rows), keys, col="k", anti=True).to_pandas()
        assert sorted(semi["k"]) == [1, 3, 5]
        assert sorted(anti["k"]) == [0, 2, 4, 6, 7]
        assert len(semi) + len(anti) == len(rows)

    def test_semi_filter_empty_keyset(self):
        import ray
        keys = ray.put(np.array([], dtype=np.int64))
        rows = [{"k": i} for i in range(4)]
        assert semi_anti_filter(_ds(rows), keys, col="k").count() == 0
        assert semi_anti_filter(_ds(rows), keys, col="k", anti=True).count() == 4
