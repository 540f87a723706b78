"""Connected-components cluster resolution: the vectorized hash-min
label propagation (stages/dedup.connected_components) vs a literal
union-find, over random graphs; plus the end-to-end survivor filter."""

import numpy as np
import pandas as pd
import pytest

from moonlink_ray.stages import dedup


def _union_find_roots(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cc_matches_union_find_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(5, 400))
    m = int(rng.integers(0, 3 * n))
    ids = rng.choice(10_000, size=n, replace=False).astype(np.int64)
    ea = rng.choice(ids, size=m)
    eb = rng.choice(ids, size=m)
    keep = ea != eb
    pairs = pd.DataFrame({"a": ea[keep], "b": eb[keep]})
    got = dedup.connected_components(pairs)

    nodes = np.unique(np.concatenate([pairs["a"], pairs["b"]])) \
        if len(pairs) else np.array([], dtype=np.int64)
    want = _union_find_roots(list(zip(pairs["a"], pairs["b"])), nodes)
    assert dict(zip(got["node"], got["root"])) == want


def test_cc_long_chain_converges():
    # worst case for naive propagation: one path graph; pointer jumping
    # must still collapse it to a single root (the smallest id)
    n = 2048
    pairs = pd.DataFrame({"a": np.arange(n - 1, dtype=np.int64),
                          "b": np.arange(1, n, dtype=np.int64)})
    got = dedup.connected_components(pairs)
    assert (got["root"] == 0).all() and len(got) == n


def test_cc_empty():
    got = dedup.connected_components(
        pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                      "b": pd.Series([], dtype=np.int64)}))
    assert len(got) == 0 and list(got.columns) == ["node", "root"]


@pytest.mark.usefixtures("ray_session")
def test_drop_duplicates_by_pairs():
    import ray.data as rd
    # clusters {1,2,3} (chain) and {7,9}; 5 untouched
    pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 9]})
    docs = rd.from_items([{"doc_id": i, "source": f"s{i}"}
                          for i in [1, 2, 3, 5, 7, 9]])
    out = dedup.drop_duplicates_by_pairs(docs, pairs).to_pandas()
    assert sorted(out["doc_id"]) == [1, 5, 7]

    # no pairs -> identity pass-through
    empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64)})
    out2 = dedup.drop_duplicates_by_pairs(docs, empty).to_pandas()
    assert sorted(out2["doc_id"]) == [1, 2, 3, 5, 7, 9]


@pytest.mark.usefixtures("ray_session")
def test_incremental_matches_full_generator(tmp_path):
    """ngram_pairs_vs_index over (indexed corpus, new batch) must equal
    ngram_jaccard_pairs over corpus+batch restricted to cross pairs."""
    import ray.data as rd
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(60):
        words = list(rng.choice(vocab, size=12))
        docs.append({"doc_id": i, "text": " ".join(words)})
    # plant near-dups crossing the corpus/batch split (batch = id%5==0)
    for a, b in [(1, 5), (2, 10), (7, 15), (3, 4)]:  # (3,4) same side
        w = docs[a]["text"].split()
        w[-1] = "zz"
        docs[b]["text"] = " ".join(w)
    ds = rd.from_items(docs)

    full = dedup.ngram_jaccard_pairs(ds, threshold_permille=400).to_pandas()
    want = {(min(a, b), max(a, b), j) for a, b, j in
            zip(full["a"], full["b"], full["jac_permille"])
            if (a % 5 == 0) != (b % 5 == 0)}
    assert want, "fixture must plant cross-split near-dups"

    corpus = ds.filter(lambda r: r["doc_id"] % 5 != 0)
    batch = ds.filter(lambda r: r["doc_id"] % 5 == 0)
    idx = str(tmp_path / "gram_index")
    dedup.build_gram_index(corpus, idx)
    got_df = dedup.ngram_pairs_vs_index(idx, batch,
                                        threshold_permille=400).to_pandas()
    got = {(min(a, b), max(a, b), j) for a, b, j in
           zip(got_df["a"], got_df["b"], got_df["jac_permille"])}
    assert got == want
    # a-side is always corpus, b-side always batch
    assert (got_df["a"] % 5 != 0).all() and (got_df["b"] % 5 == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_gram_index_fingerprint_and_atomic_rebuild(tmp_path):
    """Cache validity is fingerprint-checked (a regenerated corpus must
    invalidate), and a rebuild replaces the directory wholesale (orphan
    files from an interrupted build can never survive into a retry)."""
    import os

    import ray.data as rd
    docs = [{"doc_id": i, "text": f"alpha beta gamma delta w{i}"}
            for i in range(20)]
    corpus = rd.from_items(docs)
    idx = str(tmp_path / "gram_index")
    fp = dedup.corpus_fingerprint(corpus)
    dedup.build_gram_index(corpus, idx, fingerprint=fp)
    assert dedup.gram_index_valid(idx, fp)
    assert dedup.gram_index_valid(idx, None)  # existence-only check

    # regenerated fixture -> different fingerprint -> invalid
    docs2 = [dict(d, text=d["text"] + " extra") for d in docs]
    fp2 = dedup.corpus_fingerprint(rd.from_items(docs2))
    assert fp2 != fp and not dedup.gram_index_valid(idx, fp2)

    # plant an orphan parquet (interrupted-build debris) inside the
    # index; a rebuild must not inherit it
    some_bucket = next(p for p in os.listdir(os.path.join(idx, "grams")))
    orphan = os.path.join(idx, "grams", some_bucket, "orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    dedup.build_gram_index(corpus, idx, fingerprint=fp)
    assert not os.path.exists(orphan)
    assert dedup.gram_index_valid(idx, fp)


@pytest.mark.usefixtures("ray_session")
class TestDistributedCC:
    """connected_components_ds: the alternating-star exchange variant.
    Must equal union-find everywhere the driver-fold variant does,
    while keeping the edge list distributed (driver sees only the
    convergence signature scalars)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_union_find_random(self, seed):
        import ray.data as rd
        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 300))
        m = int(rng.integers(1, 3 * n))
        ids = rng.choice(10_000, size=n, replace=False).astype(np.int64)
        ea, eb = rng.choice(ids, size=m), rng.choice(ids, size=m)
        keep = ea != eb
        pairs = pd.DataFrame({"a": ea[keep], "b": eb[keep]})
        if not len(pairs):
            pytest.skip("degenerate draw")
        got = dedup.connected_components_ds(rd.from_pandas(pairs)) \
            .to_pandas()
        nodes = np.unique(np.concatenate([pairs["a"], pairs["b"]]))
        want = _union_find_roots(list(zip(pairs["a"], pairs["b"])), nodes)
        assert dict(zip(got["node"], got["root"])) == want

    def test_giant_component_with_chain(self):
        # one giant component (a 1500-node chain threaded through a
        # 300-clique-ish hub) plus satellites: the worst convergence
        # shape for naive propagation; star rounds must collapse it in
        # O(log n) exchanges and agree with the driver-fold kernel
        import ray.data as rd
        n = 1500
        a = np.arange(n - 1, dtype=np.int64)
        b = np.arange(1, n, dtype=np.int64)
        hub_a = np.full(300, 17, dtype=np.int64)
        hub_b = np.arange(2000, 2300, dtype=np.int64)
        sat_a = np.array([5000, 5002], dtype=np.int64)
        sat_b = np.array([5001, 5003], dtype=np.int64)
        pairs = pd.DataFrame({"a": np.concatenate([a, hub_a, sat_a]),
                              "b": np.concatenate([b, hub_b, sat_b])})
        got = dedup.connected_components_ds(rd.from_pandas(pairs),
                                            num_buckets=8).to_pandas()
        ref = dedup.connected_components(pairs)
        assert dict(zip(got["node"], got["root"])) == \
            dict(zip(ref["node"], ref["root"]))
        giant = got[got["node"] < 2300]
        assert (giant["root"] == 0).all()

    def test_empty_pairs(self):
        import ray.data as rd
        empty = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
        got = dedup.connected_components_ds(rd.from_pandas(empty))
        assert got.count() == 0
        assert set(got.schema().names) == {"node", "root"}

    def test_drop_duplicates_sharded_anti_join(self, tmp_path):
        import ray.data as rd
        # clusters {1,2,3} and {7,9}; 5 untouched — same fixture as the
        # broadcast-era test, now through the sharded drop path
        pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 9]})
        docs = rd.from_items([{"doc_id": i, "source": f"s{i}"}
                              for i in [1, 2, 3, 5, 7, 9]])
        out = dedup.drop_duplicates_by_pairs(
            docs, rd.from_pandas(pairs),
            scratch_dir=str(tmp_path)).to_pandas()
        assert sorted(out["doc_id"]) == [1, 5, 7]
        # drop set landed as hash-sharded parquet (in a per-call unique
        # subdir), not a broadcast
        import os
        (drop_dir,) = [d for d in os.listdir(tmp_path)
                       if d.startswith("drops-")]
        shards = os.listdir(str(tmp_path / drop_dir))
        assert shards and all(s.startswith("shard=") for s in shards)

    def test_driver_state_is_scalar(self):
        # the convergence loop's only driver-side artifact is the
        # (count, hashsum) signature — assert the helper returns plain
        # scalars for a non-trivial edge set
        import ray.data as rd
        pairs = pd.DataFrame({"a": np.arange(0, 200, dtype=np.int64),
                              "b": np.arange(1, 201, dtype=np.int64)})
        ds = rd.from_pandas(pairs).map_batches(
            lambda t: t.rename_columns(["u", "v"]), batch_format="pyarrow")
        sig = dedup._edge_sig(ds)
        assert isinstance(sig, tuple) and len(sig) == 2
        assert all(isinstance(x, int) for x in sig)


@pytest.mark.usefixtures("ray_session")
def test_corpus_fingerprint_is_partition_invariant():
    """The fingerprint must be a pure function of corpus CONTENT —
    re-blocking the same rows (different CPU counts / batch sizes in
    Ray) must not change it, or the gram-index cache would spuriously
    rebuild on every partitioning shift."""
    import ray.data as rd
    docs = [{"doc_id": i, "text": f"some text payload number {i}"}
            for i in range(257)]
    one = rd.from_items(docs).repartition(1)
    many = rd.from_items(docs).repartition(13)
    assert dedup.corpus_fingerprint(one) == dedup.corpus_fingerprint(many)
