"""Deduplication operators for training-data pipelines.

Five families, each shaped for Ray Data streaming execution:

- **exact**: content-hash inside ``map_batches`` (vectorized), then
  ``groupby(hash).map_groups(keep first by id)`` — one shuffle over
  (hash, id, payload).
- **MinHash + LSH**: shingle -> minhash signature per batch (numpy,
  vectorized over a doc's shingles), explode to (band, band_hash, id)
  rows, ``groupby`` the tiny band table, emit candidate pairs, verify
  exact n-gram Jaccard. Only the *band rows* shuffle — never the text.
- **SimHash**: 64-bit token-weight simhash; candidates via 4x16-bit
  band buckets (hamming<=3 guarantee by pigeonhole), verify hamming.
- **n-gram Jaccard**: the exact verifier, also exposed standalone.
- **embedding cosine**: blocked (by a coarse key, e.g. label or an LSH
  bucket) pairwise cosine inside ``map_groups`` — numpy matmul per
  block, never an O(n^2) global join.

Scale notes: verify stages never hold the corpus. The candidate-pair
list (tiny by LSH/blocking design) is semi-joined back to the corpus on
id — only texts/gram-counts of docs that appear in a pair are fetched
and broadcast, so driver + per-worker state is O(candidates), not
O(corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .keys import stable_hash_strings

_GB_BUCKETS = 64  # shuffle buckets for per-key grouping (see note below)

# NOTE on groupby granularity: Ray's ``groupby(k).map_groups(fn)`` calls
# the Python fn once per DISTINCT key — with ~n distinct keys that is n
# Python calls and dominates wall time. Every high-cardinality grouping
# here therefore shuffles on ``hash(key) % _GB_BUCKETS`` and runs ONE
# vectorized pandas callback per bucket (pandas groupby/drop_duplicates
# inside), which is also the right shape at 10^12 rows: bounded task
# count, bounded per-task state.


def exact_dedup(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Exact dedup: stable content hash per batch, hash-partition by
    bucket, keep the minimum-id row per identical content."""
    def add_hash(batch: pa.Table) -> pa.Table:
        h = stable_hash_strings(batch[text_col]).astype(np.int64)
        batch = batch.append_column("_h", pa.array(h, pa.int64()))
        return batch.append_column(
            "_gb", pa.array((h % _GB_BUCKETS).astype(np.int64), pa.int64()))

    def first(bucket: pa.Table) -> pa.Table:
        # full document rows ride this fold: keep it Arrow (no pandas
        # copy of the text column) — sort by (_h, id), keep each hash
        # run's first row
        import pyarrow.compute as pc
        idx = pc.sort_indices(bucket, sort_keys=[("_h", "ascending"),
                                                 (id_col, "ascending")])
        bucket = bucket.take(idx)
        h = bucket["_h"].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return bucket
        keep = np.concatenate(
            [[0], np.nonzero(np.diff(h) != 0)[0] + 1])
        return bucket.take(pa.array(keep, pa.int64()))

    out = ds.map_batches(add_hash, batch_format="pyarrow")
    return out.groupby("_gb").map_groups(first, batch_format="pyarrow") \
        .drop_columns(["_h", "_gb"])


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (uint64) of one document."""
    words = text.lower().split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    return np.unique(stable_hash_strings(np.array(grams, dtype=object)))


_P31 = (1 << 31) - 1  # Mersenne prime; 31-bit domain keeps a*x+b in int64


def make_perms(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P31, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _P31, size=num_perm, dtype=np.int64)
    return a, b


def minhash_signature(shingles: np.ndarray, perms: tuple[np.ndarray, np.ndarray]) -> np.ndarray:
    """num_perm-wide minhash signature, fully vectorized:
    h_i(x) = (a_i * x + b_i) mod (2^31 - 1) over the 31-bit-folded
    shingle hashes; a*x+b < 2^62 so plain int64 math is exact."""
    a, b = perms
    if len(shingles) == 0:
        return np.full(len(a), _P31, dtype=np.int64)
    x = (shingles.astype(np.uint64) % np.uint64(_P31)).astype(np.int64)
    return ((a[:, None] * x[None, :] + b[:, None]) % _P31).min(axis=1)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = _shingles(text_a, k), _shingles(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


class MinHashStage:
    """Actor-pool map_batches stage: doc -> LSH band rows.

    Permutation tables are built once per actor (__init__); __call__
    vectorizes over each doc's shingle set. Emits one row per (doc,
    band): (id, band, band_hash).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 seed: int = 1):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.bands, self.rows_per_band = bands, num_perm // bands
        self.shingle_k = shingle_k
        # vectorized permutation tables: (num_perm,) int64
        self.a, self.b = make_perms(num_perm, seed)
        self.__name__ = "MinHashStage"

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"id": pa.array([]),
                             "band": pa.array([], pa.int32()),
                             "band_hash": pa.array([], pa.int64())})
        # one signature matrix for the whole batch: concat every doc's
        # shingles, hash all permutations in one matmul-shaped op, then
        # segment-min with reduceat (no per-doc Python math)
        sets = [_shingles(t or "", self.shingle_k) for t in texts]
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        nonempty = lens > 0
        x = (np.concatenate([s for s in sets if len(s)], dtype=np.uint64)
             if nonempty.any() else np.array([], dtype=np.uint64))
        sigs = np.full((len(self.a), n), _P31, dtype=np.int64)
        if len(x):
            xi = (x % np.uint64(_P31)).astype(np.int64)
            H = (self.a[:, None] * xi[None, :] + self.b[:, None]) % _P31
            offsets = np.concatenate(([0], np.cumsum(lens[nonempty])[:-1]))
            sigs[:, nonempty] = np.minimum.reduceat(H, offsets, axis=1)
        # vectorized band hash: FNV-style fold over the band's rows
        S = sigs.astype(np.uint64).reshape(self.bands, self.rows_per_band, n)
        bh = np.full((self.bands, n), 0xcbf29ce484222325, dtype=np.uint64)
        for r in range(self.rows_per_band):
            bh = (bh ^ S[:, r, :]) * np.uint64(0x100000001b3)
        ids_np = batch[self.id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            "id": pa.array(np.tile(ids_np, self.bands)),
            "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64), pa.int64()),
        })


def candidate_pairs_from_bands(band_ds, *, max_bucket: int | None = 2000):
    """(band, band_hash) buckets -> unique candidate id pairs (a < b).

    Shuffles on hash(band, band_hash) % _GB_BUCKETS; inside each bucket
    only rows whose (band, band_hash) is duplicated are touched — the
    vast majority of band hashes are unique and are filtered out
    vectorized; pair emission per colliding signature is a numpy
    triu_indices take, not a Python loop. ``max_bucket`` skips
    signatures shared by more than that many docs (the LSH skew guard:
    one degenerate signature — e.g. all-empty docs — would otherwise
    emit a quadratic pair set; a signature shared by >2000 docs is a
    dup-cluster whose pairs carry no marginal information)."""
    def add_bucket(batch: pa.Table) -> pa.Table:
        h = (batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
             * np.uint64(0x9E3779B97F4A7C15)
             + batch["band"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return batch.append_column(
            "_gb", pa.array((h % _GB_BUCKETS).astype(np.int64), pa.int64()))

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = bucket["id"].iloc[:0]
        dup = bucket[bucket.duplicated(["band", "band_hash"], keep=False)]
        out_a, out_b = [], []
        for _, g in dup.groupby(["band", "band_hash"], sort=False):
            ids = np.unique(np.asarray(sorted(set(g["id"]))))
            if len(ids) < 2 or (max_bucket and len(ids) > max_bucket):
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if not out_a:
            return pd.DataFrame({"a": empty, "b": empty.copy()})
        return pd.DataFrame({
            "a": pd.Series(np.concatenate(out_a), dtype=empty.dtype),
            "b": pd.Series(np.concatenate(out_b), dtype=empty.dtype)})

    bucketed = band_ds.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("_gb").map_groups(pairs, batch_format="pandas")


def gather_column(ds, ids: np.ndarray, *, id_col="doc_id", col="text"):
    """Semi-join the corpus down to ``ids`` and return {id: col value}.

    The needed-id set is broadcast (O(candidates), tiny); the corpus
    streams through a vectorized filter and only matching rows reach the
    driver — never the corpus itself. This is the scale-safe verify
    fetch: driver + broadcast state is proportional to the candidate
    pair list, not the 100-TB corpus."""
    import ray

    ids_ref = ray.put(np.sort(ids))

    def pick(batch: pa.Table) -> pa.Table:
        want = ray.get(ids_ref)
        got = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, got, side="left").clip(0, len(want) - 1)
        return batch.filter(pa.array(want[pos] == got)) \
            .select([id_col, col])

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    return {r[id_col]: r[col] for r in rows}


def gather_texts(ds, ids: np.ndarray, *, id_col="doc_id", text_col="text"):
    return gather_column(ds, ids, id_col=id_col, col=text_col)


def dedupe_pairs(cand):
    """Drop duplicate (a, b) candidate rows (a pair surfaces once per
    colliding band): bucket on hash(a) so identical pairs co-locate,
    one vectorized drop_duplicates per bucket (_GB_BUCKETS rationale)."""
    def add_pb(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch.assign(_gb=pd.Series([], dtype=np.int64))
        h = pd.util.hash_pandas_object(batch["a"], index=False).to_numpy()
        return batch.assign(_gb=(h % _GB_BUCKETS).astype(np.int64))

    return cand.map_batches(add_pb, batch_format="pandas") \
        .groupby("_gb").map_groups(
            lambda g: g.drop_duplicates(["a", "b"]).drop(columns="_gb"),
            batch_format="pandas")


def minhash_dedup_pairs(ds, *, id_col="doc_id", text_col="text",
                        num_perm=64, bands=16, shingle_k=3,
                        verify_threshold=0.8):
    """Full MinHash-LSH near-dup pipeline -> verified pairs Dataset
    (columns a, b, jaccard). The verify stage joins the (tiny) candidate
    pair list back to the corpus: only texts of docs that appear in a
    candidate pair are ever fetched or broadcast (see gather_texts)."""
    import ray
    import ray.data as rd

    band_ds = ds.map_batches(
        MinHashStage(id_col=id_col, text_col=text_col, num_perm=num_perm,
                     bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow", batch_size=512)
    cand = candidate_pairs_from_bands(band_ds)
    uniq = dedupe_pairs(cand)

    # candidate pairs are tiny relative to the corpus by LSH design —
    # collect them, fetch ONLY the texts they reference, verify
    # distributed with the small dict broadcast
    pair_df = uniq.to_pandas()
    if len(pair_df) == 0:
        return rd.from_pandas(pd.DataFrame({
            "a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
            "jaccard": pd.Series([], dtype=np.float64)}))
    need = np.unique(np.concatenate([pair_df["a"].to_numpy(),
                                     pair_df["b"].to_numpy()]))
    texts_ref = ray.put(gather_texts(ds, need, id_col=id_col,
                                     text_col=text_col))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch.assign(jaccard=pd.Series([], dtype=np.float64))
        texts = ray.get(texts_ref)
        jac = [jaccard(texts[a], texts[b], shingle_k)
               for a, b in zip(batch["a"], batch["b"])]
        batch = batch.assign(jaccard=jac)
        return batch[batch["jaccard"] >= verify_threshold]

    return rd.from_pandas(pair_df).map_batches(verify, batch_format="pandas")


# ------------------------------------------------------- n-gram Jaccard

def gram_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-gram hashes; empty for docs with < k words
    (strict — no short-doc fallback, so the SQL oracle can mirror it)."""
    words = (text or "").lower().split()
    if len(words) < k:
        return np.array([], dtype=np.uint64)
    grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    return np.unique(stable_hash_strings(np.array(grams, dtype=object)))


def ngram_jaccard_pairs(ds, *, id_col="doc_id", text_col="text", k=3,
                        threshold_permille=500, max_df: int | None = 1000):
    """Exact n-gram Jaccard near-dup pairs via gram blocking.

    explode (gram_hash, id) -> groupby(gram) -> pair rows -> count shared
    grams per pair -> jaccard from per-doc gram counts, where the gram
    counts are computed ONLY for docs that appear in a candidate pair
    (semi-join of the pair-id set back to the corpus — driver/broadcast
    state is O(candidate pairs), never O(corpus)). ``max_df`` drops
    grams shared by more than max_df docs: without it one ubiquitous
    gram (a stop-phrase at web scale) creates a quadratic bucket —
    max_df=1000 bounds any gram's pair fan-out at ~500k while leaving
    genuine near-dup evidence (rare shared grams) untouched. Pass None
    for the exact small-data setting. Returns Dataset (a, b,
    jac_permille) with jac_permille = floor(1000*|∩|/|∪|) >=
    threshold_permille.
    """
    import ray

    def explode(batch: pa.Table) -> pa.Table:
        out_ids, out_g = [], []
        for rid, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            g = gram_hashes(text, k)
            out_ids.extend([rid] * len(g))
            out_g.extend(g.astype(np.int64))
        return pa.table({"id": pa.array(out_ids),
                         "g": pa.array(out_g, pa.int64())})

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = batch["g"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column(
            "_gb", pa.array((h % _GB_BUCKETS).astype(np.int64), pa.int64()))

    grams = ds.map_batches(explode, batch_format="pyarrow") \
        .map_batches(add_bucket, batch_format="pyarrow")

    def pairs(bucket: pd.DataFrame) -> pd.DataFrame:
        empty = bucket["id"].iloc[:0]
        dup = bucket[bucket.duplicated("g", keep=False)]
        out_a, out_b = [], []
        for _, g in dup.groupby("g", sort=False):
            ids = np.unique(np.asarray(sorted(set(g["id"]))))
            if len(ids) < 2 or (max_df is not None and len(ids) > max_df):
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if not out_a:
            return pd.DataFrame({"a": empty, "b": empty.copy()})
        return pd.DataFrame({
            "a": pd.Series(np.concatenate(out_a), dtype=empty.dtype),
            "b": pd.Series(np.concatenate(out_b), dtype=empty.dtype)})

    pair_rows = grams.groupby("_gb").map_groups(pairs, batch_format="pandas")
    # materialize once: the aggregated pair table (bounded by candidate
    # pairs) is consumed twice below — without this the whole
    # explode+shuffle would re-execute per consumer. The shared-gram
    # count per pair uses the Arrow group_by combiner
    # (relational.partial_groupby_sum), NOT Ray's sort-based aggregate:
    # measured 178 s -> ~2 s over 1.27M pair rows at sf0.1 (the same
    # 80x-class gap the round-3 relational work measured).
    from .relational import partial_groupby_sum
    inter = partial_groupby_sum(pair_rows, ["a", "b"], [],
                                count_col="i").materialize()

    # per-doc gram counts for ONLY the docs that appear in a pair
    def pair_ids(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"id": pd.concat([batch["a"], batch["b"]], ignore_index=True)})

    uniq_ids = inter.map_batches(pair_ids, batch_format="pandas") \
        .unique("id") or []  # unique() is None on an empty dataset
    need = np.sort(np.array(sorted(uniq_ids)))
    if len(need) == 0:
        return inter.map_batches(
            lambda b: b[["a", "b"]].assign(
                jac_permille=pd.Series([], dtype=np.int64)),
            batch_format="pandas")
    need_ref = ray.put(need)

    def sizes(batch: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        got = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, got, side="left").clip(0, len(want) - 1)
        batch = batch.filter(pa.array(want[pos] == got))
        n = [len(gram_hashes(t, k)) for t in batch[text_col].to_pylist()]
        return pa.table({"id": batch[id_col],
                         "n": pa.array(n, pa.int64())})

    size_rows = ds.map_batches(sizes, batch_format="pyarrow").take_all()
    sizes_ref = ray.put({r["id"]: r["n"] for r in size_rows})

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch.assign(jac_permille=pd.Series([], dtype=np.int64))
        ns = ray.get(sizes_ref)
        na = batch["a"].map(ns).to_numpy(dtype=np.int64)
        nb = batch["b"].map(ns).to_numpy(dtype=np.int64)
        i = batch["i"].to_numpy(dtype=np.int64)
        union = na + nb - i
        jac = np.floor(1000.0 * i / np.maximum(union, 1)).astype(np.int64)
        out = batch[["a", "b"]].assign(jac_permille=jac)
        return out[out["jac_permille"] >= threshold_permille]

    return inter.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------- simhash

def simhash64(texts: list[str]) -> np.ndarray:
    """64-bit simhash per text from token hashes (vectorized per doc)."""
    out = np.empty(len(texts), dtype=np.int64)
    weights_bits = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        if not words:
            out[i] = 0
            continue
        hs = stable_hash_strings(np.array(words, dtype=object))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        score = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 vote per token
        h = np.bitwise_or.reduce(weights_bits[score > 0]) \
            if (score > 0).any() else np.uint64(0)
        out[i] = int(h.astype(np.int64))
    return out


def simhash_stage(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column(
        "simhash", pa.array(simhash64(batch[text_col].to_pylist()), pa.int64()))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.astype(np.uint64) ^ b.astype(np.uint64))
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)


def simhash_dedup_pairs(ds, *, id_col="doc_id", text_col="text",
                        hamming_max: int = 3, bands: int = 4):
    """SimHash near-dup pairs: 64-bit signature, ``bands`` x
    (64/bands)-bit band buckets, exact hamming verify.

    Pigeonhole guarantee: ``hamming_max`` bit flips touch at most
    ``hamming_max`` bands, so any pair within ``hamming_max <= bands-1``
    shares at least one identical band and surfaces as a candidate.
    Only (id, band, band_hash) rows ever shuffle — never text. The
    verify fetches signatures for candidate ids only (gather_column:
    O(candidates) state) and filters by exact hamming distance.
    Returns Dataset(a, b, hamming).
    """
    import ray.data as rd

    assert 64 % bands == 0 and hamming_max <= bands - 1
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    sim = ds.map_batches(
        lambda b: simhash_stage(b, text_col).select([id_col, "simhash"]),
        batch_format="pyarrow").materialize()  # consumed twice (bands + verify)

    def band_rows(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        band = np.repeat(np.arange(bands, dtype=np.int32), n)
        bh = np.concatenate([
            ((h >> np.uint64(width * b)) & mask).astype(np.int64)
            for b in range(bands)])
        return pa.table({"id": pa.array(np.tile(ids, bands)),
                         "band": pa.array(band),
                         "band_hash": pa.array(bh, pa.int64())})

    cand = candidate_pairs_from_bands(
        sim.map_batches(band_rows, batch_format="pyarrow"))
    pair_df = dedupe_pairs(cand).to_pandas()
    if len(pair_df) == 0:
        return rd.from_pandas(pd.DataFrame({
            "a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object),
            "hamming": pd.Series([], dtype=np.int64)}))
    need = np.unique(np.concatenate([pair_df["a"].to_numpy(),
                                     pair_df["b"].to_numpy()]))
    sigs = gather_column(sim, need, id_col=id_col, col="simhash")
    ham = hamming64(pair_df["a"].map(sigs).to_numpy(dtype=np.int64),
                    pair_df["b"].map(sigs).to_numpy(dtype=np.int64))
    out = pair_df.assign(hamming=ham)
    return rd.from_pandas(out[out["hamming"] <= hamming_max])


# ------------------------------------------------------- embedding cosine

def embedding_dup_pairs(ds, *, id_col="vec_id", emb_col="embedding",
                        block_col="label", threshold=0.95,
                        max_block=20_000, n_bits=8, seed=3):
    """Near-dup pairs by cosine similarity, blocked by ``block_col``:
    per-block numpy matmul inside map_groups (no global O(n^2)).

    Hot-label guard: a degenerate label holding more than ``max_block``
    rows would ship its whole cell to ONE map_groups task and pay
    O(n^2) there. A cheap per-label count pass (driver state O(labels)
    — the block column is a coarse key by contract) finds such labels,
    and their rows are sub-blocked by hyperplane-LSH bucket BEFORE the
    exchange, so each task sees at most ~n/2^n_bits of the hot cell.
    Within a hot label, recall follows the LSH collision bound of
    ``embedding_dup_pairs_lsh`` (~0.78 single-probe at t=0.95,
    n_bits=8); cold labels keep exact recall. A hot-label cell that
    STILL exceeds ``max_block`` after sub-blocking (near-identical
    embeddings — the pair list itself is O(n^2)) is skipped, keeping
    every task's output bounded."""
    def block(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2 or len(group) > max_block:
            empty = group[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty.copy(),
                                 "cosine": pd.Series([], dtype=np.float64)})
        # sort by id so triu emission guarantees a < b regardless of the
        # row order Ray's groupby happened to deliver the block in
        group = group.sort_values(id_col)
        ids = group[id_col].to_numpy()
        M = np.vstack(group[emb_col].to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = M @ M.T
        iu = np.triu_indices(len(ids), k=1)
        keep = S[iu] >= threshold
        return pd.DataFrame({"a": ids[iu[0][keep]], "b": ids[iu[1][keep]],
                             "cosine": S[iu][keep]})

    counts = {r[block_col]: r["count()"] for r in
              ds.groupby(block_col).count().take_all()}
    hot = {lbl for lbl, n in counts.items() if n > max_block}
    if not hot:
        return ds.groupby(block_col).map_groups(block,
                                                batch_format="pandas")

    from .ann import make_hyperplanes
    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def sub_block(batch: pd.DataFrame) -> pd.DataFrame:
        lbl = batch[block_col].astype(str).to_numpy(dtype=np.str_)
        cell = np.zeros(len(batch), dtype=np.int64)
        hot_m = batch[block_col].isin(hot).to_numpy()
        if hot_m.any():
            M = np.vstack(batch.loc[hot_m, emb_col].to_numpy()) \
                .astype(np.float64)
            M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True),
                            1e-12)
            P = make_hyperplanes(M.shape[1], n_bits=n_bits,
                                 seed=seed).astype(np.float64)
            cell[hot_m] = (((M @ P.T) > 0).astype(np.int64)
                           * weights).sum(axis=1)
        return batch.assign(
            _blk=np.char.add(np.char.add(lbl, "#"), cell.astype(str)))

    return ds.map_batches(sub_block, batch_format="pandas") \
        .groupby("_blk").map_groups(block, batch_format="pandas")


def embedding_dup_pairs_lsh(ds, *, id_col="vec_id", emb_col="embedding",
                            threshold=0.95, n_bits=8, seed=3,
                            max_block=20_000):
    """Embedding near-dup pairs WITHOUT a label column: block by an
    LSH bucket (random-hyperplane signs) instead.

    The labeled variant (embedding_dup_pairs) assumes a trustworthy
    coarse key; real corpora rarely have one, and a hot label
    degenerates to O(n^2) in one block. Hyperplane buckets are
    uniform-ish by construction (2^n_bits cells), and ``max_block``
    caps any residual hot cell (skew guard, same spirit as ngram's
    max_df). Recall: a pair at cosine >= t collides in a bucket with
    probability (1 - acos(t)/pi)^n_bits — at t=0.95, n_bits=8 that is
    ~0.78 single-probe; raise recall by unioning several plane seeds
    (independent probes), which multiplies only the cheap signature
    pass, never the O(n^2) term.

    Returns Dataset(a, b, cosine) with a < b.
    """
    from .ann import make_hyperplanes

    def block(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2 or len(group) > max_block:
            empty = group[id_col].iloc[:0]
            return pd.DataFrame({"a": empty, "b": empty.copy(),
                                 "cosine": pd.Series([], dtype=np.float64)})
        group = group.sort_values(id_col)
        ids = group[id_col].to_numpy()
        M = np.vstack(group[emb_col].to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = M @ M.T
        iu = np.triu_indices(len(ids), k=1)
        keep = S[iu] >= threshold
        return pd.DataFrame({"a": ids[iu[0][keep]], "b": ids[iu[1][keep]],
                             "cosine": S[iu][keep]})

    weights = (1 << np.arange(n_bits, dtype=np.int64))

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        M = np.vstack(batch[emb_col].to_numpy()).astype(np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        # planes are deterministic (seed + dim) and tiny — rebuilt per
        # batch rather than broadcast (n_bits x dim floats)
        P = make_hyperplanes(M.shape[1], n_bits=n_bits, seed=seed)             .astype(np.float64)
        signs = (M @ P.T) > 0
        return batch.assign(_lb=(signs.astype(np.int64) * weights).sum(axis=1))

    return ds.map_batches(bucketize, batch_format="pandas") \
        .groupby("_lb").map_groups(block, batch_format="pandas")


# ------------------------------------------------- cluster resolution

def connected_components(pairs_ds, *, a_col: str = "a", b_col: str = "b"):
    """Resolve candidate pairs into duplicate clusters.

    Returns a pandas DataFrame ``(node, root)`` with one row per node
    that appears in at least one pair; ``root`` is the smallest node id
    of the node's connected component (the canonical survivor).

    The pair set is the output of an LSH/blocking candidate generator,
    so it is O(candidate pairs) — orders of magnitude smaller than the
    corpus — and collecting it to the driver matches the bounded-collect
    contract the verifiers already use (see ``minhash_dedup_pairs``).
    The fold itself is vectorized hash-min label propagation with
    pointer jumping (numpy ``minimum.at`` edge relaxation + ``lab[lab]``
    contraction, O(E) work per round, O(log n) rounds) — the same
    fixpoint the distributed small-star/large-star algorithm computes,
    with no Python per-edge loop. The reference stops at per-key
    duplicate identification (index probes,
    src/moonlink/src/storage/index/mem_index.rs:173-415); this is the
    batch analog every production near-dup pipeline runs after pair
    emission.
    """
    if isinstance(pairs_ds, pd.DataFrame):
        tbl = pairs_ds
    else:
        tbl = pairs_ds.select_columns([a_col, b_col]).to_pandas()
    ea_raw = tbl[a_col].to_numpy(dtype=np.int64)
    eb_raw = tbl[b_col].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([ea_raw, eb_raw]))
    if len(nodes) == 0:
        return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                             "root": pd.Series([], dtype=np.int64)})
    ea = np.searchsorted(nodes, ea_raw)
    eb = np.searchsorted(nodes, eb_raw)
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(lab[ea], lab[eb])
        new = lab.copy()
        np.minimum.at(new, ea, m)
        np.minimum.at(new, eb, m)
        new = new[new]  # pointer jump: label <- label of my label
        if np.array_equal(new, lab):
            break
        lab = new
    return pd.DataFrame({"node": nodes, "root": nodes[lab]})


def _star_round(edges_ds, large: bool, num_buckets: int):
    """One alternating-star exchange (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): orient the edge list
    (large-star: both directions; small-star: point big->small), hash-
    bucket on the grouping endpoint, then a vectorized per-bucket
    kernel computes each node's min neighbor and re-emits the star
    edges. Edges only ever exist as a distributed Dataset."""

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        if large:
            gu = np.concatenate([u, v])
            gv = np.concatenate([v, u])
        else:
            gu = np.maximum(u, v)
            gv = np.minimum(u, v)
        gb = (gu.astype(np.uint64) % num_buckets).astype(np.int64)
        return pa.table({"u": pa.array(gu, pa.int64()),
                         "v": pa.array(gv, pa.int64()),
                         "_gb": pa.array(gb, pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        mins = uniq.copy()
        np.minimum.at(mins, inv, v)  # m(u) = min(N(u) ∪ {u})
        m = mins[inv]
        if large:
            # connect strictly-larger neighbors to m(u)
            mask = v > u
            out_u, out_v = v[mask], m[mask]
        else:
            # connect all smaller neighbors AND u itself to m(u)
            out_u = np.concatenate([v, uniq])
            out_v = np.concatenate([m, mins])
        keep = out_u != out_v
        pairs = np.unique(np.stack([out_u[keep], out_v[keep]], axis=1),
                          axis=0)
        return pa.table({"u": pa.array(pairs[:, 0], pa.int64()),
                         "v": pa.array(pairs[:, 1], pa.int64())})

    return edges_ds.map_batches(orient, batch_format="pyarrow") \
        .groupby("_gb").map_groups(kernel, batch_format="pyarrow")


def _edge_sig(edges_ds) -> tuple:
    """(count, order-insensitive 64-bit hash sum) of an edge Dataset —
    the only thing the convergence loop ships to the driver."""
    def h(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = u * np.uint64(0x9E3779B97F4A7C15) \
            ^ v * np.uint64(0xC2B2AE3D27D4EB4F)
        # ship the FULL uint64 batch sum (as two 32-bit halves — int64
        # columns can't carry it): truncating per batch would make the
        # signature depend on how blocks happen to be partitioned,
        # which shifts between rounds and fakes non-convergence
        s = int(x.sum(dtype=np.uint64))
        return pa.table({"n": pa.array([len(u)], pa.int64()),
                         "s_lo": pa.array([s & 0xFFFFFFFF], pa.int64()),
                         "s_hi": pa.array([s >> 32], pa.int64())})

    parts = edges_ds.map_batches(h, batch_format="pyarrow").take_all()
    return (sum(p["n"] for p in parts),
            sum(p["s_lo"] + (p["s_hi"] << 32) for p in parts) % (2 ** 64))


def connected_components_ds(pairs_ds, *, a_col: str = "a", b_col: str = "b",
                            num_buckets: int = _GB_BUCKETS,
                            max_rounds: int = 64):
    """Distributed connected components: alternating large-star /
    small-star label propagation run entirely as bucketed Ray Data
    exchanges. Returns a ``Dataset`` of (node, root) — one row per node
    appearing in at least one pair, root = the component's smallest id.

    Unlike :func:`connected_components` (the driver-fold variant kept
    for bounded pair frames), the edge list is NEVER collected: each
    round is one map_batches orientation + one hash-bucketed groupby
    with a numpy min-label kernel, and the driver sees only an
    (edge-count, hash-sum) convergence signature per round. The same
    fixpoint the reference's multimap index probes resolve per key
    (storage/index/hash_index.rs:35-89) emerges globally in O(log n)
    rounds (star forests are stable under both phases, so two
    consecutive unchanged signatures terminate).

    Per-task state: a task's share of the current star edges at
    16 B/edge — E/num_buckets on average. The known caveat of the
    star-contraction family applies (Kiveris et al. §"load
    balancing"): as components collapse, the component-minimum node's
    group approaches O(component) edges, which the exchange delivers
    to one kernel call. At candidate-pair scale (the generators bound
    pairs by banding/blocking caps) this is megabytes; for adversarial
    giant components the standard fix — a two-phase round computing
    m(u) with a combiner-based Min aggregate, then re-emitting
    per-block against the broadcast minima of only the hot nodes —
    composes with this loop without changing its contract."""
    import ray.data as rd

    def init(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = a != b
        return pa.table({"u": pa.array(a[keep], pa.int64()),
                         "v": pa.array(b[keep], pa.int64())})

    if isinstance(pairs_ds, pd.DataFrame):
        pairs_ds = rd.from_pandas(pairs_ds)
    edges = pairs_ds.map_batches(init, batch_format="pyarrow").materialize()
    sig = _edge_sig(edges)
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "root": pa.array([], pa.int64())})
    if sig[0] == 0:
        return rd.from_arrow(empty)

    stable = 0
    for r in range(max_rounds):
        edges = _star_round(edges, large=(r % 2 == 0),
                            num_buckets=num_buckets).materialize()
        new_sig = _edge_sig(edges)
        stable = stable + 1 if new_sig == sig else 0
        sig = new_sig
        if stable >= 2:  # one large AND one small star both no-ops
            break
    else:
        raise RuntimeError(
            f"connected_components_ds did not converge in {max_rounds} "
            f"rounds (edges={sig[0]})")

    # final edges are (node, root); add (root, root) self-rows and
    # dedupe — one last bucketed exchange, still nothing on the driver
    def orient_final(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        node = np.concatenate([u, v])
        root = np.concatenate([v, v])
        gb = (node.astype(np.uint64) % num_buckets).astype(np.int64)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "root": pa.array(root, pa.int64()),
                         "_gb": pa.array(gb, pa.int64())})

    def finish(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        root = t["root"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(node, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, root)
        return pa.table({"node": pa.array(uniq, pa.int64()),
                         "root": pa.array(mins, pa.int64())})

    return edges.map_batches(orient_final, batch_format="pyarrow") \
        .groupby("_gb").map_groups(finish, batch_format="pyarrow")


# per-worker-process cache of drop-set shards: tasks reuse worker
# processes, so repeated batches on one worker load each shard once;
# keys are (unique scratch dir, shard) so entries can never go stale
_DROP_SHARD_CACHE: dict = {}


def _drop_shard(drop_dir: str, shard: int) -> np.ndarray:
    import os
    key = (drop_dir, shard)
    arr = _DROP_SHARD_CACHE.get(key)
    if arr is None:
        if len(_DROP_SHARD_CACHE) > 256:
            _DROP_SHARD_CACHE.clear()
        part = os.path.join(drop_dir, f"shard={shard}")
        if os.path.isdir(part):
            import pyarrow.parquet as _pq
            arr = np.sort(_pq.read_table(part, columns=["node"])["node"]
                          .to_numpy(zero_copy_only=False).astype(np.int64))
        else:
            arr = np.empty(0, dtype=np.int64)
        _DROP_SHARD_CACHE[key] = arr
    return arr


def drop_duplicates_by_pairs(ds, pairs_ds, *, id_col: str = "doc_id",
                             a_col: str = "a", b_col: str = "b",
                             scratch_dir: str | None = None,
                             num_shards: int = _GB_BUCKETS,
                             stale_drop_age_s: float = 3600.0):
    """Filter ``ds`` to the canonical survivor of every duplicate
    cluster implied by ``pairs_ds`` (plus all unclustered rows).

    Fully distributed: clusters resolve via
    :func:`connected_components_ds` (bucketed star exchanges), the
    non-canonical drop set is written as hash-sharded sorted parquet
    (one ``shard=K`` partition per ``hash(node) % num_shards``), and
    the corpus then streams through a sharded ANTI-JOIN — each batch
    probes only the shards its ids hash into, loaded once per worker
    process. Driver state is O(1) (a scratch path and convergence
    scalars); nothing proportional to the dup rate is collected or
    broadcast, unlike the round-4 ``ray.put`` drop-set broadcast whose
    bound grew with corpus dup rate.

    ``scratch_dir`` contract: it must be visible to every worker that
    will run the anti-join — on a multi-node cluster pass a path on
    the table's shared filesystem / object store (the same place
    fragments live); the node-local tempdir default is only valid in
    single-node deployments. Each call writes into a fresh unique
    subdirectory, so reusing one ``scratch_dir`` across calls can
    never mix stale drop shards into a later run — and prior calls'
    subdirectories older than ``stale_drop_age_s`` are reaped on entry
    (a persistent scratch_dir would otherwise grow one drop-set copy
    per call forever; the age floor keeps a concurrent run's live
    shards safe)."""
    import os
    import shutil
    import tempfile
    import time as _t
    import uuid

    cc = connected_components_ds(pairs_ds, a_col=a_col, b_col=b_col)

    def drops(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        root = t["root"].to_numpy(zero_copy_only=False)
        node = node[node != root]
        shard = (node.astype(np.uint64) % num_shards).astype(np.int64)
        return pa.table({"node": pa.array(node, pa.int64()),
                         "shard": pa.array(shard, pa.int64())})

    if scratch_dir is None:
        scratch_dir = tempfile.mkdtemp(prefix="mlray-dropset-")
    else:
        now = _t.time()
        for name in os.listdir(scratch_dir) \
                if os.path.isdir(scratch_dir) else []:
            p = os.path.join(scratch_dir, name)
            if name.startswith("drops-") and os.path.isdir(p) and \
                    now - os.path.getmtime(p) > stale_drop_age_s:
                shutil.rmtree(p, ignore_errors=True)
    drop_dir = os.path.join(scratch_dir, f"drops-{uuid.uuid4().hex[:12]}")
    cc.map_batches(drops, batch_format="pyarrow") \
        .write_parquet(drop_dir, partition_cols=["shard"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return batch
        shards = ids.astype(np.uint64) % num_shards
        mask = np.ones(len(ids), dtype=bool)
        for s in np.unique(shards):
            d = _drop_shard(drop_dir, int(s))
            if len(d) == 0:
                continue
            sel = shards == s
            pos = np.searchsorted(d, ids[sel]).clip(0, len(d) - 1)
            mask[sel] = d[pos] != ids[sel]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


# -------------------------------------------- incremental (indexed) dedup

def _explode_grams(batch: pa.Table, id_col: str, text_col: str, k: int,
                   n_buckets: int) -> pa.Table:
    """(id, gram-hash, bucket) explosion shared by the index BUILD and
    the batch PROBE — the stop-gram guard's exactness depends on both
    sides bucketing grams byte-identically, so this must stay the single
    copy of that logic."""
    out_ids, out_g = [], []
    for rid, text in zip(batch[id_col].to_pylist(),
                         batch[text_col].to_pylist()):
        g = gram_hashes(text, k)
        out_ids.extend([rid] * len(g))
        out_g.extend(g.astype(np.int64))
    gb = (np.array(out_g, dtype=np.int64).astype(np.uint64)
          % n_buckets).astype(np.int64)
    return pa.table({"id": pa.array(out_ids),
                     "g": pa.array(out_g, pa.int64()),
                     "gb": pa.array(gb, pa.int64())})


def corpus_fingerprint(ds, *, id_col: str = "doc_id",
                       text_col: str = "text") -> dict:
    """Deterministic corpus fingerprint for index-cache validation:
    row count + id sum + content-hash sum (mod 2^64). One column-pruned
    pass. Per-batch partials ship their FULL mod-2^64 sums as two
    32-bit halves (the ``_edge_sig`` pattern): truncating per batch
    would make the fingerprint depend on how Ray happens to partition
    blocks (CPU count, batch size), spuriously invalidating the cache
    every time the partitioning shifts."""
    def fp(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        th = stable_hash_strings(batch[text_col]).astype(np.uint64)
        i = int(ids.sum(dtype=np.uint64))     # numpy wraps mod 2^64
        t = int(th.sum(dtype=np.uint64))
        return pa.table({"n": pa.array([len(ids)], pa.int64()),
                         "id_lo": pa.array([i & 0xFFFFFFFF], pa.int64()),
                         "id_hi": pa.array([i >> 32], pa.int64()),
                         "th_lo": pa.array([t & 0xFFFFFFFF], pa.int64()),
                         "th_hi": pa.array([t >> 32], pa.int64())})

    parts = ds.map_batches(fp, batch_format="pyarrow").take_all()
    return {"n": sum(p["n"] for p in parts),
            "id_sum": sum(p["id_lo"] + (p["id_hi"] << 32)
                          for p in parts) % (2 ** 64),
            "th_sum": sum(p["th_lo"] + (p["th_hi"] << 32)
                          for p in parts) % (2 ** 64)}


def gram_index_valid(index_dir: str, fingerprint: dict | None) -> bool:
    """True iff a complete index manifest exists and (when a fingerprint
    is supplied) records the same corpus fingerprint — a regenerated
    fixture must never be silently paired with a stale index."""
    import json
    import os
    path = os.path.join(index_dir, "gram_manifest.json")
    if not os.path.exists(path):
        return False
    if fingerprint is None:
        return True
    with open(path) as f:
        manifest = json.load(f)
    return manifest.get("fingerprint") == fingerprint


def build_gram_index(ds, index_dir: str, *, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 3,
                     n_buckets: int = _GB_BUCKETS,
                     fingerprint: dict | None = None) -> dict:
    """Materialize a corpus's n-gram dedup evidence as a bucketed
    inverted layout: one parquet directory per gram-hash bucket of
    (id, g) rows, a ``sizes.parquet`` sidecar (id, n distinct grams),
    and a JSON manifest.

    At 10^12 docs this is the dedup-index BUILD job (one explode pass +
    a partitioned write, no shuffle beyond file routing — the same
    layout story as ``ann.build_ivf_index``). Deduping an incoming
    batch then reads ONLY the buckets the batch's grams touch, never
    the corpus text: the batch-vs-corpus analog of the reference's
    persisted index probe (storage/index/persisted_bucket_hash_map.rs),
    where re-running ``ngram_jaccard_pairs`` over corpus+batch would
    re-explode the full corpus per batch.
    """
    import json
    import os
    import shutil

    # Build into a sibling temp dir and rename into place: an
    # interrupted build can never leave orphan parquet alongside a
    # later retry's files (which would silently duplicate (id, g) rows
    # and corrupt intersection counts) — same tmp+replace discipline as
    # manifest.commit.
    tmp_dir = index_dir.rstrip("/") + ".building"
    shutil.rmtree(tmp_dir, ignore_errors=True)

    ds.map_batches(lambda b: _explode_grams(b, id_col, text_col, k,
                                            n_buckets),
                   batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp_dir, "grams"),
                       partition_cols=["gb"])

    def sizes(batch: pa.Table) -> pa.Table:
        n = [len(gram_hashes(t, k)) for t in batch[text_col].to_pylist()]
        return pa.table({"id": batch[id_col],
                         "n": pa.array(n, pa.int64())})

    ds.map_batches(sizes, batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp_dir, "sizes"))

    manifest = {"k": k, "n_buckets": int(n_buckets)}
    if fingerprint is not None:
        manifest["fingerprint"] = fingerprint
    with open(os.path.join(tmp_dir, "gram_manifest.json"), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(index_dir, ignore_errors=True)
    os.rename(tmp_dir, index_dir)
    return manifest


def ngram_pairs_vs_index(index_dir: str, new_ds, *, id_col: str = "doc_id",
                         text_col: str = "text",
                         threshold_permille: int = 500,
                         max_df: int | None = 1000):
    """Exact n-gram Jaccard pairs between an incoming batch and an
    indexed corpus (``build_gram_index``), WITHOUT touching corpus text.

    Batch grams explode and group by bucket; each bucket task reads only
    its own index partition, applies the ``max_df`` stop-gram guard over
    the union df (corpus + batch — identical to what a full re-run over
    corpus∪batch would compute, provided the index covers exactly the
    non-batch docs), and emits per-bucket partial (a=corpus, b=new)
    match counts. Corpus gram-set sizes come from the index's sizes
    sidecar filtered to ONLY the ids that appear in a pair; batch sizes
    are recomputed via the same bounded semi-join as
    ``ngram_jaccard_pairs``. Returns Dataset (a, b, jac_permille).
    Batch-internal (new×new) duplicates are out of scope by contract —
    run the standard generator over the batch alone for those.
    """
    import json
    import os

    import ray

    with open(os.path.join(index_dir, "gram_manifest.json")) as f:
        manifest = json.load(f)
    k, n_buckets = manifest["k"], manifest["n_buckets"]

    new_grams = new_ds.map_batches(
        lambda b: _explode_grams(b, id_col, text_col, k, n_buckets),
        batch_format="pyarrow")

    def probe_bucket(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": group["id"].iloc[:0],
                              "b": group["id"].iloc[:0].copy(),
                              "i": pd.Series([], dtype=np.int64)})
        if len(group) == 0:
            return empty
        gb = int(group["gb"].iloc[0])
        part = os.path.join(index_dir, "grams", f"gb={gb}")
        if not os.path.isdir(part):
            return empty
        import pyarrow.parquet as _pq
        corpus = _pq.read_table(part, columns=["id", "g"]).to_pandas()
        if max_df is not None:
            # union df per gram (corpus + batch) — the stop-gram guard a
            # full corpus∪batch re-run would apply; exact because gram
            # space is partitioned by bucket
            df = pd.concat([corpus["g"], group["g"]]).value_counts()
            hot = df.index[df > max_df]
            corpus = corpus[~corpus["g"].isin(hot)]
            group = group[~group["g"].isin(hot)]
        m = corpus.merge(group[["id", "g"]], on="g",
                         suffixes=("_c", "_n"))
        if len(m) == 0:
            return empty
        out = m.groupby(["id_c", "id_n"], sort=False).size().reset_index()
        out.columns = ["a", "b", "i"]
        return out.astype({"i": np.int64})

    from .relational import partial_groupby_sum
    inter = partial_groupby_sum(
        new_grams.groupby("gb").map_groups(probe_bucket,
                                           batch_format="pandas"),
        ["a", "b"], ["i"], count_col=None).materialize()

    ab = inter.select_columns(["a", "b"]).to_pandas()
    if len(ab) == 0:
        return inter.map_batches(
            lambda b: b[["a", "b"]].assign(
                jac_permille=pd.Series([], dtype=np.int64)),
            batch_format="pandas")
    need_a = sorted(set(ab["a"]))
    import pyarrow.parquet as _pq
    import pyarrow.dataset as _pds
    sz = _pq.ParquetDataset(
        os.path.join(index_dir, "sizes"),
        filters=_pds.field("id").isin(need_a)).read().to_pandas()
    na_map = dict(zip(sz["id"], sz["n"]))

    need_b = np.sort(np.unique(ab["b"].to_numpy()))
    need_ref = ray.put(need_b)

    def sizes_b(batch: pa.Table) -> pa.Table:
        want = ray.get(need_ref)
        got = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(want, got, side="left").clip(0, len(want) - 1)
        batch = batch.filter(pa.array(want[pos] == got))
        n = [len(gram_hashes(t, k)) for t in batch[text_col].to_pylist()]
        return pa.table({"id": batch[id_col],
                         "n": pa.array(n, pa.int64())})

    nb_rows = new_ds.map_batches(sizes_b, batch_format="pyarrow").take_all()
    nb_map = {r["id"]: r["n"] for r in nb_rows}
    sizes_ref = ray.put((na_map, nb_map))

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return batch.assign(jac_permille=pd.Series([], dtype=np.int64))
        na_m, nb_m = ray.get(sizes_ref)
        na = batch["a"].map(na_m).to_numpy(dtype=np.int64)
        nb = batch["b"].map(nb_m).to_numpy(dtype=np.int64)
        i = batch["i"].to_numpy(dtype=np.int64)
        union = na + nb - i
        jac = np.floor(1000.0 * i / np.maximum(union, 1)).astype(np.int64)
        out = batch[["a", "b"]].assign(jac_permille=jac)
        return out[out["jac_permille"] >= threshold_permille]

    return inter.map_batches(finish, batch_format="pandas")
