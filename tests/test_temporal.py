"""As-of join and sessionization (stages/temporal.py)."""

import numpy as np
import pandas as pd
import pytest

from moonlink_ray.stages.temporal import (asof_join, asof_join_bucketed,
                                          sessionize)


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

    def test_asof_join_bucketed_matches_pandas(self):
        """Two-big-sides path == pandas merge_asof, incl. keys with no
        right rows at all (empty-right buckets must null-fill)."""
        import pyarrow as pa
        import ray.data as rd
        rng = np.random.default_rng(7)
        left = pd.DataFrame({
            "k": rng.integers(0, 10, 300),          # keys 5-9 have no right
            "t": rng.integers(0, 1000, 300)})
        right = pd.DataFrame({
            "k": np.repeat(np.arange(5), 10),
            "rt": np.tile(np.arange(0, 1000, 100), 5),
            "val": np.arange(50)})
        lds = rd.from_arrow(pa.table({
            "k": pa.array(left["k"], pa.int64()),
            "t": pa.array(left["t"].to_numpy(), pa.timestamp("us"))}))
        rds = rd.from_arrow(pa.table({
            "rk": pa.array(right["k"], pa.int64()),
            "rt": pa.array(right["rt"].to_numpy(), pa.timestamp("us")),
            "val": pa.array(right["val"], pa.int64())}))
        got = asof_join_bucketed(
            lds, rds, left_on="t", right_on="rt", by_left="k", by_right="rk",
            left_schema=pa.schema([("k", pa.int64()),
                                   ("t", pa.timestamp("us"))]),
            right_schema=pa.schema([("rk", pa.int64()),
                                    ("rt", pa.timestamp("us")),
                                    ("val", pa.int64())]),
            num_buckets=8).to_pandas()
        lf = left.copy()
        lf["t"] = lf["t"].astype("datetime64[us]")
        rf = right.rename(columns={"k": "rk"}).copy()
        rf["rt"] = rf["rt"].astype("datetime64[us]")
        want = pd.merge_asof(
            lf.sort_values(["t", "k"], kind="mergesort"),
            rf.sort_values(["rt", "rk"], kind="mergesort"),
            left_on="t", right_on="rt", left_by="k", right_by="rk")
        g = got.sort_values(["k", "t", "val"]).reset_index(drop=True)
        w = want.sort_values(["k", "t", "val"]).reset_index(drop=True)
        assert len(g) == len(w)
        assert (g["val"].fillna(-1).to_numpy() ==
                w["val"].fillna(-1).to_numpy()).all()
        # keys without any right rows survive with null val
        assert g.loc[g["k"] >= 5, "val"].isna().all()

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


@pytest.mark.usefixtures("ray_session")
def test_asof_kernel_tie_semantics_vs_pandas():
    """The Arrow kernel must match merge_asof exactly on ties: equal
    timestamps on the right (take the LAST in original order), exact
    t == rt matches allowed, string keys, and keys missing rights."""
    import pyarrow as pa
    from moonlink_ray.stages.temporal import _asof_join_tables
    rng = np.random.default_rng(11)
    n_l, n_r = 400, 150
    keys = np.array([f"k{i}" for i in range(8)])
    lt = pa.table({
        "k": pa.array(rng.choice(keys, n_l)),
        "t": pa.array(rng.integers(0, 40, n_l), pa.int64())})
    rt = pa.table({
        "rk": pa.array(rng.choice(keys[:6], n_r)),   # k6/k7 no rights
        "rt": pa.array(rng.integers(0, 40, n_r), pa.int64()),
        "val": pa.array(np.arange(n_r), pa.int64())})
    got = _asof_join_tables(lt, rt, left_on="t", right_on="rt",
                            by_left="k", by_right="rk").to_pandas()
    want = pd.merge_asof(
        lt.to_pandas().sort_values(["t", "k"], kind="mergesort"),
        rt.to_pandas().sort_values(["rt", "rk"], kind="mergesort"),
        left_on="t", right_on="rt", left_by="k", right_by="rk")
    g = got.sort_values(["k", "t", "val"]).reset_index(drop=True)
    w = want.sort_values(["k", "t", "val"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["val"].fillna(-1).to_numpy() ==
            w["val"].fillna(-1).to_numpy()).all()
    assert (g["rt"].fillna(-1).to_numpy() ==
            w["rt"].fillna(-1).to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_asof_kernel_null_keys_never_match():
    """Null by-keys (object arrays containing None) must not crash the
    factorization and must match nothing — merge_asof semantics."""
    import pyarrow as pa
    from moonlink_ray.stages.temporal import _asof_join_tables
    lt = pa.table({"k": pa.array(["a", None, "b", None]),
                   "t": pa.array([5, 5, 5, 5], pa.int64())})
    rt = pa.table({"rk": pa.array(["a", None, "b"]),
                   "rt": pa.array([1, 1, 9], pa.int64()),
                   "val": pa.array([10, 20, 30], pa.int64())})
    out = _asof_join_tables(lt, rt, left_on="t", right_on="rt",
                            by_left="k", by_right="rk").to_pandas()
    by_key = dict(zip(out["k"], out["val"]))
    assert by_key["a"] == 10
    assert pd.isna(by_key["b"])         # right "b" is later than t=5
    assert out.loc[out["k"].isna(), "val"].isna().all()

    # all-null right side: every left row unmatched, no crash
    rt2 = pa.table({"rk": pa.array([None, None], pa.string()),
                    "rt": pa.array([1, 2], pa.int64()),
                    "val": pa.array([1, 2], pa.int64())})
    out2 = _asof_join_tables(lt, rt2, left_on="t", right_on="rt",
                             by_left="k", by_right="rk").to_pandas()
    assert out2["val"].isna().all()
