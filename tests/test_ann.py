import numpy as np
import pyarrow as pa
import pytest

from moonlink_ray.stages.ann import (brute_force_topk, lsh_topk,
                                     make_hyperplanes)

N, D, K = 300, 32, 10


def _data():
    rng = np.random.default_rng(5)
    M = rng.standard_normal((N, D)).astype(np.float32)
    return M


def _ds(M):
    import ray.data as rd
    return rd.from_items([{"vec_id": i, "embedding": M[i].tolist()}
                          for i in range(N)])


def _exact_topk(M, qids, k):
    Mn = M.astype(np.float64)
    Mn /= np.linalg.norm(Mn, axis=1, keepdims=True)
    out = {}
    for q in qids:
        sims = Mn @ Mn[q]
        order = sorted(range(N), key=lambda i: (-sims[i], i))
        out[q] = [i for i in order if i != q][:k]
    return out


@pytest.mark.usefixtures("ray_session")
class TestAnn:
    def test_brute_force_matches_numpy(self):
        import ray
        M = _data()
        qids = [0, 1, 2]
        qref = ray.put({"ids": np.array(qids), "mat": M[qids]})
        got = brute_force_topk(_ds(M), qref, k=K).to_pandas()
        want = _exact_topk(M, qids, K)
        for q in qids:
            g = set(got[got["query_id"] == q]["vec_id"])
            assert g == set(want[q])

    def test_lsh_recall_floor(self):
        import ray
        M = _data()
        qids = [0, 1, 2, 3]
        qref = ray.put({"ids": np.array(qids), "mat": M[qids]})
        planes = make_hyperplanes(D, n_bits=4)
        got = lsh_topk(_ds(M), qref, planes=planes, k=K).to_pandas()
        want = _exact_topk(M, qids, K)
        recalls = []
        for q in qids:
            g = set(got[got["query_id"] == q]["vec_id"])
            recalls.append(len(g & set(want[q])) / K)
        # single-probe 4-bit LSH: ~1/16 of the corpus searched; top
        # neighbors correlate with the query's bucket, so recall beats
        # random (10/300) by a wide margin
        assert np.mean(recalls) > 0.2

    def test_ivf_recall_floor(self):
        import ray
        from moonlink_ray.stages.ann import ivf_topk, train_centroids
        M = _data()
        qids = [0, 1, 2, 3]
        qref = ray.put({"ids": np.array(qids), "mat": M[qids]})
        C = train_centroids(M, n_centroids=8, seed=11)
        got = ivf_topk(_ds(M), qref, centroids=C, nprobe=3, k=K).to_pandas()
        want = _exact_topk(M, qids, K)
        recalls = []
        for q in qids:
            g = set(got[got["query_id"] == q]["vec_id"])
            recalls.append(len(g & set(want[q])) / K)
        # probing 3/8 lists must beat the random floor comfortably
        assert np.mean(recalls) > 0.5

    def test_ivf_centroids_deterministic(self):
        from moonlink_ray.stages.ann import train_centroids
        M = _data()
        assert np.array_equal(train_centroids(M, 8, seed=11),
                              train_centroids(M, 8, seed=11))


@pytest.mark.usefixtures("ray_session")
def test_ivf_indexed_matches_inflight(tmp_path):
    """Searching the materialized IVF layout returns exactly the same
    top-k as the in-flight ivf_topk with the same centroids/nprobe."""
    import ray
    import ray.data as rd

    from moonlink_ray.stages.ann import (build_ivf_index, ivf_search_indexed,
                                         ivf_topk, train_centroids)

    rng = np.random.default_rng(11)
    n, d = 400, 16
    M = rng.standard_normal((n, d))
    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(M), pa.list_(pa.float64()))})
    qref = ray.put({"ids": np.arange(3), "mat": M[:3]})
    cent = train_centroids(M[:256], n_centroids=8)

    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_arrow(t), idx, centroids=cent)
    got = ivf_search_indexed(idx, qref, nprobe=3, k=5).to_pandas()
    want = ivf_topk(rd.from_arrow(t), qref, centroids=cent,
                    nprobe=3, k=5).to_pandas()
    g = got.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    assert g[["query_id", "vec_id"]].equals(w[["query_id", "vec_id"]])
    # manifest covers every row
    import json, os
    man = json.load(open(os.path.join(idx, "ivf_manifest.json")))
    assert sum(man["counts"].values()) == n
