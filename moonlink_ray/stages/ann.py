"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — each ``map_batches`` task matmuls
its batch against a *broadcast* query matrix (``ray.put`` once, read
per actor/task) and emits only its local top-k rows per query; a tiny
final ``groupby(query_id)`` reduces partials to the global top-k. The
corpus streams; only O(num_queries * k * num_blocks) partial rows ever
shuffle.

Scale path: LSH bucketing (random hyperplane signs) — corpus rows are
bucketed once; a query probes only its own (and optionally neighboring)
buckets. At 10^12 rows the buckets become the partition key of the
stored table so probing is a zone-map-pruned fragment read, same trick
as MERGE key pruning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _norm_rows(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class BruteForceTopK:
    """map_batches stage: batch x queries cosine -> local top-k partials."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding"):
        import ray
        q = ray.get(queries_ref)  # {"ids": (nq,), "mat": (nq, d)}
        self.qids = np.asarray(q["ids"])
        self.Q = _norm_rows(np.asarray(q["mat"], dtype=np.float64))
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        M = np.vstack(batch[self.emb_col].to_numpy(zero_copy_only=False))
        M = _norm_rows(M.astype(np.float64))
        S = self.Q @ M.T  # (nq, batch)
        k = min(self.k, S.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(S.shape[0]):
            # deterministic local cut: exact lexsort on (-cosine, id) so
            # a cosine tie at the k-boundary resolves identically to the
            # oracle's ORDER BY sim DESC, vec_id regardless of block
            # membership (argpartition alone would keep an arbitrary one)
            top = np.lexsort((ids, -S[qi]))[:k]
            out_q.extend([self.qids[qi]] * k)
            out_v.extend(ids[top])
            out_s.extend(S[qi, top])
        return pa.table({
            "query_id": pa.array(np.asarray(out_q, dtype=np.int64)),
            "vec_id": pa.array(np.asarray(out_v, dtype=np.int64)),
            "cosine": pa.array(np.asarray(out_s, dtype=np.float64)),
        })


def brute_force_topk(ds, queries_ref, *, k: int = 10, id_col: str = "vec_id",
                     emb_col: str = "embedding", exclude_self: bool = True):
    """Global cosine top-k per query. Ties broken by ascending vec_id
    (deterministic). Returns Dataset(query_id, vec_id, cosine)."""
    # instance => task pool: per-worker state is one local-object-store
    # ray.get of the broadcast queries, so tasks beat an actor pool's
    # cold-start ramp (see stages/__init__.default_concurrency)
    partials = ds.map_batches(
        BruteForceTopK(queries_ref=queries_ref, k=k + 1,
                       id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow", batch_size=4096)

    def reduce_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group
        if exclude_self:
            g = g[g["vec_id"] != g["query_id"]]
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True])
        return g.head(k)

    return partials.groupby("query_id").map_groups(reduce_topk,
                                                   batch_format="pandas")


# ------------------------------------------------------------- LSH / IVF

def make_hyperplanes(dim: int, n_bits: int = 12, seed: int = 3) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_bits, dim))


def lsh_bucket_stage(planes: np.ndarray, emb_col: str = "embedding"):
    """Returns a map_batches fn adding an int64 LSH bucket column."""
    P = planes.astype(np.float64)
    weights = (1 << np.arange(P.shape[0], dtype=np.int64))

    def fn(batch: pa.Table) -> pa.Table:
        M = np.vstack(batch[emb_col].to_numpy(zero_copy_only=False))
        signs = (_norm_rows(M.astype(np.float64)) @ P.T) > 0
        bucket = (signs.astype(np.int64) * weights).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket, pa.int64()))
    return fn


def train_centroids(sample: np.ndarray, n_centroids: int = 16,
                    iters: int = 10, seed: int = 7) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (at scale
    the sample comes from ``ds.random_sample``). Returns (n_centroids, d)
    unit-norm centroids."""
    rng = np.random.default_rng(seed)
    X = _norm_rows(np.asarray(sample, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _norm_rows(C)
    return C


def ivf_topk(ds, queries_ref, *, centroids: np.ndarray, nprobe: int = 2,
             k: int = 10, id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF-flat ANN: rows are assigned to their nearest centroid inside
    map_batches; each query probes its ``nprobe`` nearest centroid lists
    and brute-forces only those. At 10^12 rows the centroid id is the
    stored partition key, so the probe is a zone-map-pruned fragment
    read (same layout trick as lsh_topk)."""
    import ray

    C = _norm_rows(np.asarray(centroids, dtype=np.float64))
    q = ray.get(queries_ref)
    Q = _norm_rows(np.asarray(q["mat"], dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted = np.unique(probe)

    def assign_and_prune(batch: pa.Table) -> pa.Table:
        M = np.vstack(batch[emb_col].to_numpy(zero_copy_only=False))
        cid = np.argmax(_norm_rows(M.astype(np.float64)) @ C.T, axis=1)
        return batch.filter(pa.array(np.isin(cid, wanted)))

    pruned = ds.map_batches(assign_and_prune, batch_format="pyarrow")
    return brute_force_topk(pruned, queries_ref, k=k, id_col=id_col,
                            emb_col=emb_col)


def lsh_topk(ds, queries_ref, *, planes: np.ndarray, k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding"):
    """ANN top-k searching only the query's LSH bucket (single-probe).

    Approximate by design: recall < 1 vs brute force; tested against a
    recall floor, not equality. The bucketed corpus would be the stored
    layout at scale (see module docstring)."""
    import ray

    q = ray.get(queries_ref)
    Q = _norm_rows(np.asarray(q["mat"], dtype=np.float64))
    signs = (Q @ planes.astype(np.float64).T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    qbucket = (signs.astype(np.int64) * weights).sum(axis=1)
    wanted = set(int(b) for b in qbucket)

    bucketed = ds.map_batches(lsh_bucket_stage(planes, emb_col),
                              batch_format="pyarrow")

    def only_wanted(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch["lsh_bucket"].to_numpy(), list(wanted))
        return batch.filter(pa.array(mask))

    pruned = bucketed.map_batches(only_wanted, batch_format="pyarrow")
    return brute_force_topk(pruned, queries_ref, k=k, id_col=id_col,
                            emb_col=emb_col)


# ------------------------------------------------- materialized IVF index

def build_ivf_index(ds, index_dir: str, *, centroids: np.ndarray,
                    emb_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Materialize the corpus partitioned by IVF list id (the stored
    layout the module docstring promises): one parquet directory per
    centroid list via a partitioned Dataset write, plus a tiny JSON
    manifest (centroids + per-list counts).

    At 10^12 rows this is the index BUILD job: a single assign pass and
    a partitioned write — no shuffle beyond the write's file routing;
    queries then read only their ``nprobe`` list directories
    (zone-map-style pruning made physical). Returns the manifest dict.
    """
    import json
    import os

    C = _norm_rows(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        M = np.vstack(batch[emb_col].to_numpy(zero_copy_only=False))
        cid = np.argmax(_norm_rows(M.astype(np.float64)) @ C.T, axis=1)
        return batch.append_column("ivf_list", pa.array(cid, pa.int64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    assigned.write_parquet(index_dir, partition_cols=["ivf_list"])

    counts: dict[int, int] = {}
    for name in sorted(os.listdir(index_dir)):
        if name.startswith("ivf_list="):
            lid = int(name.split("=", 1)[1])
            import pyarrow.parquet as _pq
            n = sum(_pq.read_metadata(os.path.join(index_dir, name, f)).num_rows
                    for f in os.listdir(os.path.join(index_dir, name))
                    if f.endswith(".parquet"))
            counts[lid] = n
    manifest = {"n_lists": int(len(C)), "dim": int(C.shape[1]),
                "counts": {str(k): v for k, v in counts.items()},
                "centroids": [[float(x) for x in row] for row in C]}
    tmp = os.path.join(index_dir, "ivf_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(index_dir, "ivf_manifest.json"))
    return manifest


def ivf_search_indexed(index_dir: str, queries_ref, *, nprobe: int = 2,
                       k: int = 10, id_col: str = "vec_id",
                       emb_col: str = "embedding"):
    """Search a materialized IVF index: read ONLY the nprobe nearest
    list partitions per query set, then the standard local-top-k /
    reduce. Identical results to in-flight ``ivf_topk`` with the same
    centroids and nprobe (pytest holds the parity proof)."""
    import json
    import os

    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "ivf_manifest.json")) as f:
        manifest = json.load(f)
    C = np.asarray(manifest["centroids"], dtype=np.float64)
    q = ray.get(queries_ref)
    Q = _norm_rows(np.asarray(q["mat"], dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted = sorted(int(c) for c in np.unique(probe))
    dirs = [os.path.join(index_dir, f"ivf_list={c}") for c in wanted]
    dirs = [d for d in dirs if os.path.isdir(d)]  # empty lists never wrote
    # read_parquet accepts one directory or a list of FILES — expand
    files = [os.path.join(d, f) for d in dirs
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return rd.from_items([])
    pruned = rd.read_parquet(files, columns=[id_col, emb_col])
    return brute_force_topk(pruned, queries_ref, k=k, id_col=id_col,
                            emb_col=emb_col)
