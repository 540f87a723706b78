"""Z-order clustering: rewrite the table sorted by an interleaved key.

Absent from moonlink (its only layout maintenance is compaction + index
merge, ``/root/reference/src/moonlink/src/storage/mooncake_table/
snapshot_maintenance.rs``); added per the north rule. The closest
moonlink analog is index merge — consolidating many small sorted
structures into one — but here it is the *data* that gets a spatial
order so phash-range queries touch few fragments (zone-map locality).

Ray-Data shape:

    scan(DV applied)
      -> map_batches: derive _zkey = bit-interleave(phash[hi32], w, h)
         and _salt (stable hash of image_id, nonzero only for hot keys)
      -> sort(["_zkey", "_salt"])   # sample-based range partitioning
      -> map_batches(write one fragment per sorted block)
      -> driver folds manifest (full rewrite) and swaps the pointer.

Skew handling (explicit, per the north rule): ~10% of rows are
near-duplicates whose phash collides into a few hot buckets; identical
_zkey values would all land in one range partition and straggle. The
driver first estimates per-zkey frequencies from per-batch partial
counts (no shuffle), marks zkeys above ``hot_threshold`` of total rows,
and gives their rows a secondary sort key ``_salt`` = stable hash of
image_id. Ray's range partitioner samples boundaries over the composite
key, so one hot zkey now spreads across many partitions while the
global (zkey, salt) order — and therefore zone-map locality — is
preserved.
"""

from __future__ import annotations

import json
import uuid
from collections import Counter
from dataclasses import asdict

import numpy as np
import pyarrow as pa

from ..fragments import write_fragment
from ..manifest import FragmentMeta, Snapshot, commit, load
from ..sources.scan import scan
from ..stages.keys import stable_hash_strings, zorder_key
from ..synth import IMAGES_SCHEMA
from .merge import _chunk_by_bytes


def estimate_hot_zkeys(root: str, snap: Snapshot, hot_threshold: float) -> set[int]:
    """Per-batch partial zkey counts -> driver combine -> hot set.

    Reads only (phash, w, h): a few bytes per row, no image payload.
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
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        totals[row["zkey"]] += row["n"]
    total = sum(totals.values())
    if total == 0:
        return set()
    cut = max(2, int(total * hot_threshold))
    return {zk for zk, n in totals.items() if n >= cut}


def cluster(root: str, *, run_id: str | None = None,
            hot_threshold: float = 0.001,
            fragment_target_bytes: int = 128 * 1024 * 1024) -> Snapshot | None:
    """Full-table Z-order rewrite; returns the new snapshot.

    At 100 TB scale this job runs per key-range partition of the table
    (cluster a shard per invocation); the sort is then bounded by the
    shard, not the table. The sandbox fixture clusters the whole table.
    """
    import ray.data as rd  # noqa: F401

    run_id = run_id or uuid.uuid4().hex[:12]
    snap = load(root)
    if not snap.fragments:
        return None
    hot = estimate_hot_zkeys(root, snap, hot_threshold)

    def derive(batch: pa.Table) -> pa.Table:
        zk = zorder_key(batch["phash"].to_numpy(zero_copy_only=False),
                        batch["w"].to_numpy(zero_copy_only=False),
                        batch["h"].to_numpy(zero_copy_only=False))
        salt = np.zeros(len(zk), dtype=np.int64)
        if hot:
            hot_mask = np.isin(zk, np.fromiter(hot, dtype=np.int64))
            if hot_mask.any():
                salts = (stable_hash_strings(batch["image_id"])
                         % np.uint64(1 << 16)).astype(np.int64)
                salt[hot_mask] = salts[hot_mask]
        batch = batch.append_column("_zkey", pa.array(zk, pa.int64()))
        return batch.append_column("_salt", pa.array(salt, pa.int64()))

    ds = scan(root, fragments=snap.fragments)
    ds = ds.map_batches(derive, batch_format="pyarrow")
    ds = ds.sort(["_zkey", "_salt"])

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"meta": pa.array([], pa.string())})
        out = batch.select(IMAGES_SCHEMA.names).cast(IMAGES_SCHEMA)
        metas = []
        tag = uuid.uuid4().hex[:8]
        for n, chunk in enumerate(_chunk_by_bytes(out, fragment_target_bytes)):
            frag_id = f"frag-{run_id}-z{tag}-{n:03d}"
            metas.append(write_fragment(root, chunk, frag_id,
                                        lineage=[], max_lsn=snap.max_lsn))
        return pa.table({"meta": pa.array([json.dumps(asdict(m)) for m in metas],
                                          pa.string())})

    rows = ds.map_batches(write_block, batch_size=None,
                          batch_format="pyarrow").take_all()
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
                       "hot_zkeys": len(hot)},
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
