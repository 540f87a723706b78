"""As-of join and sessionization (stages/temporal.py)."""

import numpy as np
import pandas as pd
import pytest

from moonlink_ray.stages.temporal import asof_join, sessionize


def _ds(rows):
    import ray.data as rd
    return rd.from_items(rows)


@pytest.mark.usefixtures("ray_session")
class TestTemporal:
    def test_asof_join_matches_pandas(self):
        import ray
        rng = np.random.default_rng(3)
        left = [{"k": int(rng.integers(0, 5)), "t": int(rng.integers(0, 1000))}
                for _ in range(200)]
        right = pd.DataFrame({
            "k": np.repeat(np.arange(5), 10),
            "rt": np.tile(np.arange(0, 1000, 100), 5),
            "val": np.arange(50)})
        ref = ray.put(right)
        got = asof_join(_ds(left), ref, left_on="t", right_on="rt",
                        by_left="k", by_right="k",
                        right_cols=["val"]).to_pandas()
        lf = pd.DataFrame(left).sort_values(["t", "k"], kind="mergesort")
        want = pd.merge_asof(lf, right.sort_values(["rt", "k"], kind="mergesort"),
                             left_on="t", right_on="rt",
                             left_by="k", right_by="k")
        g = got.sort_values(["k", "t", "val"]).reset_index(drop=True)
        w = want.sort_values(["k", "t", "val"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(g[["k", "t", "val"]], w[["k", "t", "val"]])

    def test_sessionize_gaps(self):
        rows = []
        # user a: ts 0,10,20 | 1000,1010 -> 2 sessions; user b: 5 -> 1
        for t in (0, 10, 20, 1000, 1010):
            rows.append({"u": "a", "ts": t})
        rows.append({"u": "b", "ts": 5})
        got = sessionize(_ds(rows), key_col="u", ts_col="ts",
                         gap_us=100).to_pandas().sort_values(["u", "ts"])
        sess = dict(zip(zip(got["u"], got["ts"]), got["session_id"]))
        assert sess[("a", 0)] == sess[("a", 10)] == sess[("a", 20)] == "a#0"
        assert sess[("a", 1000)] == sess[("a", 1010)] == "a#1"
        assert sess[("b", 5)] == "b#0"

    def test_sessionize_single_row_keys(self):
        rows = [{"u": f"u{i}", "ts": i} for i in range(50)]
        got = sessionize(_ds(rows), key_col="u", ts_col="ts",
                         gap_us=1).to_pandas()
        assert len(got) == 50
        assert set(got["session_id"]) == {f"u{i}#0" for i in range(50)}
