import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from moonlink_ray.stages import dedup

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "completely different text about databases and distributed systems"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (4, "another unrelated sentence mentioning compilers and type theory"),
    (5, "completely different text about databases and distributed query engines"),  # near-dup of 2
]


def _ds():
    import ray.data as rd
    return rd.from_items([{"doc_id": i, "text": t} for i, t in DOCS])


@pytest.mark.usefixtures("ray_session")
class TestDedup:
    def test_exact_dedup(self):
        out = dedup.exact_dedup(_ds()).to_pandas().sort_values("doc_id")
        assert list(out["doc_id"]) == [0, 1, 2, 4, 5]  # 3 deduped into 0

    def test_minhash_lsh_pairs(self):
        pairs = dedup.minhash_dedup_pairs(
            _ds(), verify_threshold=0.5,
            num_perm=64, bands=32).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert (0, 3) in got          # exact dup always caught
        assert (0, 1) in got or (1, 3) in got  # near-dup caught
        assert (0, 2) not in got

    def test_gather_texts_is_candidate_bounded(self):
        # the verify fetch must return ONLY the requested ids — the
        # no-O(corpus)-driver-state contract of the dedup verify stages
        out = dedup.gather_texts(_ds(), np.array([1, 4]))
        assert out == {1: DOCS[1][1], 4: DOCS[4][1]}

    def test_jaccard_exact(self):
        assert dedup.jaccard(DOCS[0][1], DOCS[3][1]) == 1.0
        assert dedup.jaccard(DOCS[0][1], DOCS[2][1]) < 0.1
        assert 0.5 < dedup.jaccard(DOCS[0][1], DOCS[1][1]) < 1.0

    def test_minhash_signature_estimates_jaccard(self):
        perms = dedup.make_perms(256)
        sa = dedup._shingles(DOCS[0][1])
        sb = dedup._shingles(DOCS[1][1])
        siga = dedup.minhash_signature(sa, perms)
        sigb = dedup.minhash_signature(sb, perms)
        est = (siga == sigb).mean()
        true = dedup.jaccard(DOCS[0][1], DOCS[1][1])
        assert abs(est - true) < 0.2

    def test_simhash_hamming(self):
        h = dedup.simhash64([t for _, t in DOCS])
        d_near = dedup.hamming64(h[0:1], h[1:2])[0]
        d_far = dedup.hamming64(h[0:1], h[2:3])[0]
        assert h[0] == h[3]
        assert d_near < d_far

    def test_simhash_pairs_match_bruteforce(self):
        # banding guarantees recall for hamming <= bands-1 and the
        # verify is exact, so the pipeline must EQUAL brute force
        import itertools
        for hmax in (0, 3):
            got_df = dedup.simhash_dedup_pairs(
                _ds(), hamming_max=hmax, bands=4).to_pandas()
            got = {tuple(sorted((a, b))): h for a, b, h in
                   zip(got_df["a"], got_df["b"], got_df["hamming"])}
            sigs = dedup.simhash64([t for _, t in DOCS])
            want = {}
            for i, j in itertools.combinations(range(len(DOCS)), 2):
                h = dedup.hamming64(sigs[i:i + 1], sigs[j:j + 1])[0]
                if h <= hmax:
                    want[(DOCS[i][0], DOCS[j][0])] = h
            assert got == want
        assert (0, 3) in got  # exact dup pair at hamming 0

    def test_embedding_pairs(self):
        import ray.data as rd
        rng = np.random.default_rng(0)
        base = rng.standard_normal((20, 16)).astype(np.float32)
        base[7] = base[3] + 0.001  # planted near-dup, same label bucket
        items = [{"vec_id": i, "embedding": base[i].tolist(),
                  "label": i % 2 if i not in (3, 7) else 1} for i in range(20)]
        items[3]["label"] = 1
        ds = rd.from_items(items)
        pairs = dedup.embedding_dup_pairs(ds, threshold=0.99).to_pandas()
        got = {tuple(sorted((a, b))) for a, b in zip(pairs["a"], pairs["b"])}
        assert (3, 7) in got
        assert len(got) == 1

    def test_ngram_jaccard_pairs_vs_bruteforce(self):
        import itertools
        pairs = dedup.ngram_jaccard_pairs(
            _ds(), threshold_permille=400).to_pandas()
        got = {(a, b): j for a, b, j in
               zip(pairs["a"], pairs["b"], pairs["jac_permille"])}
        # brute-force reference over gram string sets
        def grams(s):
            w = s.lower().split()
            return set(" ".join(w[i:i + 3]) for i in range(len(w) - 2)) \
                if len(w) >= 3 else set()
        want = {}
        for (a, ta), (b, tb) in itertools.combinations(DOCS, 2):
            ga, gb = grams(ta), grams(tb)
            if not ga or not gb:
                continue
            jac = int(np.floor(1000.0 * len(ga & gb) / len(ga | gb)))
            if jac >= 400:
                want[(a, b)] = jac
        assert got == want
        assert (0, 3) in got and got[(0, 3)] == 1000  # exact dup

    def test_ngram_max_df_drops_hot_grams(self):
        # with max_df=1 every gram bucket is dropped -> no pairs
        pairs = dedup.ngram_jaccard_pairs(
            _ds(), threshold_permille=0, max_df=1).to_pandas()
        assert len(pairs) == 0


@pytest.mark.usefixtures("ray_session")
def test_embedding_lsh_blocking_precision_and_recall():
    """Label-free LSH blocking: every emitted pair really is >= t
    cosine (exact precision), and recall vs brute force is above the
    single-probe analytic floor for planted near-duplicates."""
    import ray.data as rd

    from moonlink_ray.stages.dedup import embedding_dup_pairs_lsh

    rng = np.random.default_rng(9)
    n, d = 300, 32
    M = rng.standard_normal((n, d))
    # plant 30 near-duplicate pairs (tiny perturbations)
    for i in range(30):
        M[n - 1 - i] = M[i] + 0.01 * rng.standard_normal(d)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu = np.triu_indices(n, k=1)
    truth = {(int(a), int(b)) for a, b in zip(iu[0][S[iu] >= 0.95],
                                              iu[1][S[iu] >= 0.95])}
    assert len(truth) >= 30

    t = pa.table({"vec_id": pa.array(np.arange(n), pa.int64()),
                  "embedding": pa.array(list(M), pa.list_(pa.float64()))})
    got = embedding_dup_pairs_lsh(rd.from_arrow(t), threshold=0.95,
                                  n_bits=6).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
    assert got_pairs <= truth  # exact verify -> no false positives
    # single-probe recall floor: (1 - acos(.95)/pi)^6 ~= 0.52; planted
    # pairs are much closer than 0.95 so observed recall is far higher
    assert len(got_pairs) >= len(truth) * 0.5


@pytest.mark.usefixtures("ray_session")
def test_embedding_hot_label_is_sub_blocked():
    """A degenerate hot label no longer ships O(n^2) to one task: rows
    over max_block are sub-blocked by hyperplane-LSH bucket before the
    exchange. Planted near-dups inside the hot label are still found
    (LSH recall floor), every emitted pair is exact-verified >= t, and
    cold labels keep exact recall."""
    import ray.data as rd

    rng = np.random.default_rng(4)
    n_hot, d = 400, 32
    M = rng.standard_normal((n_hot, d))
    for i in range(40):                       # planted dups in hot label
        M[n_hot - 1 - i] = M[i] + 0.01 * rng.standard_normal(d)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu = np.triu_indices(n_hot, k=1)
    truth_hot = {(int(a), int(b)) for a, b in zip(iu[0][S[iu] >= 0.95],
                                                  iu[1][S[iu] >= 0.95])}
    assert len(truth_hot) >= 40

    items = [{"vec_id": i, "embedding": M[i].tolist(), "label": "hot"}
             for i in range(n_hot)]
    # one cold label with a planted pair — must keep EXACT recall
    cold = rng.standard_normal((4, d))
    cold[3] = cold[0] + 0.001 * rng.standard_normal(d)
    items += [{"vec_id": 1000 + i, "embedding": cold[i].tolist(),
               "label": "cold"} for i in range(4)]

    got = dedup.embedding_dup_pairs(
        rd.from_items(items), threshold=0.95, max_block=100,
        n_bits=5).to_pandas()
    got_pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
    hot_found = {p for p in got_pairs if p[0] < 1000}
    assert hot_found <= truth_hot             # no false positives
    # single-probe LSH floor at n_bits=5 is ~0.58; planted pairs are
    # far tighter than 0.95 so observed recall is much higher
    assert len(hot_found) >= len(truth_hot) * 0.5
    assert (1000, 1003) in got_pairs          # cold label: exact recall
