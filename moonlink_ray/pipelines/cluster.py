"""Z-order clustering: rewrite the table sorted by an interleaved key.

Absent from moonlink (its only layout maintenance is compaction + index
merge, ``/root/reference/src/moonlink/src/storage/mooncake_table/
snapshot_maintenance.rs``); added per the north rule. The closest
moonlink analog is index merge — consolidating many small sorted
structures into one — but here it is the *data* that gets a spatial
order so phash-range queries touch few fragments (zone-map locality).

Ray-Data shape (explicit range partitioning, no Ray Sort op):

    pass 1 (metadata-cheap): scan only (phash, w, h) -> per-batch zkey
       histograms -> driver merges: quantile BOUNDARIES for ~2xCPU
       range buckets + the hot-zkey set (skew detection).
    pass 2: scan(full rows) -> map_batches: _zb = searchsorted(
       boundaries, zkey); rows of HOT zkeys are spread deterministically
       across a run of buckets by hash(image_id) (salting) -> ONE
       groupby(_zb) exchange -> per-bucket callback: vectorized sort by
       (zkey, salt), size-capped fragment writes -> manifest fold +
       atomic pointer swap.

Why not ``ds.sort``: a global sort shuffles the same bytes but pays a
sample pass plus per-block tuple sorts, and measured ~no speedup from
8 to 32 CPUs here; explicit quantile buckets reuse the engine's proven
bucketed-exchange shape (same as the MERGE fold), keep partition count
= O(cluster width), and make the skew handling explicit — which the
north rule demands anyway.

Skew handling: ~10% of rows are near-duplicates whose phash collides
into a few hot zkeys; all-equal keys would land in one range bucket and
straggle. Hot zkeys (sampled frequency above ``hot_threshold``) are
spread across ``ceil(freq / bucket_capacity)`` consecutive buckets by a
stable hash of image_id — bounded zone-map widening, no straggler. The
intra-zkey order this gives up is meaningless for locality (equal zkey
== same spatial cell).
"""

from __future__ import annotations

import json
import uuid
from collections import Counter
from dataclasses import asdict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..fragments import write_fragment
from ..manifest import FragmentMeta, Snapshot, commit, load
from ..sources.scan import scan
from ..stages.keys import stable_hash_strings, zorder_key
from ..synth import IMAGES_SCHEMA
from .merge import _chunk_by_bytes


def _zkey_stats(root: str, snap: Snapshot) -> Counter:
    """One metadata-cheap pass: per-batch zkey counts, driver combine.
    Reads only (phash, w, h) — a few bytes per row, no image payload.

    At 10^12 rows the per-batch return would be a capped reservoir
    sample + top-k counts instead of the exact histogram; the driver
    math below is unchanged.
    """
    ds = scan(root, columns=["phash", "w", "h"], fragments=snap.fragments)

    def partial(batch: pa.Table) -> pa.Table:
        zk = zorder_key(batch["phash"].to_numpy(zero_copy_only=False),
                        batch["w"].to_numpy(zero_copy_only=False),
                        batch["h"].to_numpy(zero_copy_only=False))
        vals, counts = np.unique(zk, return_counts=True)
        return pa.table({"zkey": pa.array(vals, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    totals: Counter = Counter()
    for row in ds.map_batches(partial, batch_size=None,
                              batch_format="pyarrow").take_all():
        totals[row["zkey"]] += row["n"]
    return totals


def estimate_hot_zkeys(root: str, snap: Snapshot, hot_threshold: float) -> set[int]:
    """Hot set from the zkey histogram (kept as a public helper)."""
    totals = _zkey_stats(root, snap)
    total = sum(totals.values())
    if total == 0:
        return set()
    cut = max(2, int(total * hot_threshold))
    return {zk for zk, n in totals.items() if n >= cut}


def _plan_buckets(totals: Counter, num_buckets: int, hot_threshold: float):
    """Quantile boundaries + per-hot-zkey spread widths.

    Returns (boundaries: sorted int64 array of len num_buckets-1,
    hot: dict zkey -> spread bucket count)."""
    total = sum(totals.values())
    if total == 0:
        return np.array([], dtype=np.int64), {}
    keys = np.fromiter(totals.keys(), dtype=np.int64)
    keys.sort()
    counts = np.fromiter((totals[int(k)] for k in keys), dtype=np.int64)
    cum = np.cumsum(counts)
    per_bucket = total / num_buckets
    marks = per_bucket * np.arange(1, num_buckets)
    idx = np.searchsorted(cum, marks, side="left").clip(0, len(keys) - 1)
    boundaries = keys[idx]
    cut = max(2, int(total * hot_threshold))
    hot = {int(k): int(np.ceil(c / per_bucket))
           for k, c in zip(keys, counts) if c >= cut}
    return boundaries, hot


def cluster(root: str, *, run_id: str | None = None,
            hot_threshold: float = 0.001,
            num_buckets: int | None = None,
            fragment_target_bytes: int = 128 * 1024 * 1024) -> Snapshot | None:
    """Full-table Z-order rewrite; returns the new snapshot.

    At 100 TB scale this job runs per key-range shard of the table
    (cluster a shard per invocation); the exchange is then bounded by
    the shard, not the table. The sandbox fixture clusters the whole
    table.
    """
    import ray
    import ray.data as rd  # noqa: F401

    run_id = run_id or uuid.uuid4().hex[:12]
    snap = load(root)
    if not snap.fragments:
        return None
    n_cpus = int(ray.cluster_resources().get("CPU", 4))
    # floor of 64 buckets: bucket count well above CPU count keeps the
    # long tail short (wall ~ sum/width, not max single bucket)
    NB = num_buckets or max(64, 2 * n_cpus)
    totals = _zkey_stats(root, snap)
    boundaries, hot = _plan_buckets(totals, NB, hot_threshold)

    def derive(batch: pa.Table) -> pa.Table:
        zk = zorder_key(batch["phash"].to_numpy(zero_copy_only=False),
                        batch["w"].to_numpy(zero_copy_only=False),
                        batch["h"].to_numpy(zero_copy_only=False))
        salt = np.zeros(len(zk), dtype=np.int64)
        zb = (np.searchsorted(boundaries, zk, side="left").astype(np.int64)
              if len(boundaries) else np.zeros(len(zk), dtype=np.int64))
        if hot:
            hot_keys = np.fromiter(hot.keys(), dtype=np.int64)
            hot_mask = np.isin(zk, hot_keys)
            if hot_mask.any():
                salts = (stable_hash_strings(batch["image_id"])
                         % np.uint64(1 << 16)).astype(np.int64)
                salt[hot_mask] = salts[hot_mask]
                spread = np.array([hot[int(z)] for z in zk[hot_mask]],
                                  dtype=np.int64)
                zb[hot_mask] = np.minimum(
                    zb[hot_mask] + salts[hot_mask] % np.maximum(spread, 1),
                    NB - 1)
        batch = batch.append_column("_zkey", pa.array(zk, pa.int64()))
        batch = batch.append_column("_salt", pa.array(salt, pa.int64()))
        return batch.append_column("_zb", pa.array(zb, pa.int64()))

    from ..schema import table_schema
    out_schema = table_schema(snap)

    def write_bucket(t: pa.Table) -> pa.Table:
        # zero-copy Arrow group (binary payloads never become pandas
        # objects); one call per range bucket
        zb = int(t["_zb"][0].as_py())
        t = t.take(pc.sort_indices(
            t, sort_keys=[("_zkey", "ascending"), ("_salt", "ascending"),
                          ("image_id", "ascending")]))
        out = t.select(out_schema.names).cast(out_schema)
        metas = []
        for n, chunk in enumerate(_chunk_by_bytes(out, fragment_target_bytes)):
            frag_id = f"frag-{run_id}-z{zb:05d}-{n:03d}"
            metas.append(write_fragment(root, chunk, frag_id,
                                        lineage=[], max_lsn=snap.max_lsn))
        return pa.table({"meta": pa.array(
            [json.dumps(asdict(m)) for m in metas], pa.string())})

    write_bucket.__name__ = "ClusterBucketWriter"
    ds = scan(root, fragments=snap.fragments, schema_list=snap.schema)
    # batch_size=None: fuse-safe (see scan() docstring)
    ds = ds.map_batches(derive, batch_size=None, batch_format="pyarrow")
    rows = ds.groupby("_zb").map_groups(write_bucket, batch_format="pyarrow") \
        .take_all()
    new_metas = [FragmentMeta.from_dict(json.loads(r["meta"])) for r in rows]
    # record lineage: every new fragment derives from the full victim set
    sources = sorted(f.fragment_id for f in snap.fragments)
    for m in new_metas:
        m.lineage = sources

    got = sum(m.rows for m in new_metas)
    want = snap.total_rows
    if got != want:
        raise AssertionError(f"cluster row mismatch: wrote {got}, expected {want}")
    new_metas.sort(key=lambda m: m.fragment_id)
    return commit(root, new_metas, max_lsn=snap.max_lsn,
                  job={"kind": "cluster", "run_id": run_id,
                       "hot_zkeys": len(hot), "num_buckets": NB},
                  expected_parent=snap.version)


def phash_range_locality(snap: Snapshot, n_probes: int = 64,
                         seed: int = 7) -> float:
    """Locality metric: avg #fragments whose phash zone map intersects a
    random narrow phash range. Lower after clustering == better."""
    rng = np.random.default_rng(seed)
    ranges = []
    for _ in range(n_probes):
        lo = int(rng.integers(-(2 ** 62), 2 ** 62))
        ranges.append((lo, lo + 2 ** 48))
    hits = 0
    for lo, hi in ranges:
        for f in snap.fragments:
            st = f.stats.get("phash")
            if st and not (st[1] < lo or st[0] > hi):
                hits += 1
    return hits / n_probes
