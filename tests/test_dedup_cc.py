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
