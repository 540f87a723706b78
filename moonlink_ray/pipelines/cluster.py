"""Z-order clustering: rewrite the table sorted by an interleaved key.

Absent from moonlink (its only layout maintenance is compaction + index
merge, ``/root/reference/src/moonlink/src/storage/mooncake_table/
snapshot_maintenance.rs``); added per the north rule. The closest
moonlink analog is index merge — consolidating many small sorted
structures into one — but here it is the *data* that gets a spatial
order so phash-range queries touch few fragments (zone-map locality).

Ray-Data shape (explicit range partitioning; the wide exchange is a
direct per-bucket spill, NOT a Ray sort/groupby):

    pass 1 (metadata-cheap, bounded): scan only (phash, w, h) -> per
       batch a capped weighted zkey SAMPLE + top-k counts (driver state
       is O(batches x cap), never O(distinct zkeys)) -> driver derives
       quantile BOUNDARIES for ~2xCPU range buckets + the hot-zkey set.
    pass 2a (spill): scan(full rows) -> map_batches task: _zb =
       searchsorted(boundaries, zkey); HOT zkeys spread across a run of
       buckets by hash(image_id) (salting); the task slices its block
       by _zb and appends ONE uncompressed parquet spill file per
       bucket it touches, directly to the table's filesystem.
    pass 2b (bucket sort): one task per bucket reads exactly the spill
       files the completed pass-2a run recorded, sorts by (zkey, salt,
       image_id), writes size-capped fragments + per-bucket lineage ->
       manifest fold + atomic pointer swap.

Why spill instead of ``groupby(_zb).map_groups`` (round-1 shape): Ray's
groupby is a sort-based all-to-all — every image byte takes several
object-store hops (map block -> plasma -> sort exchange -> reduce
read) plus a sample pass. The spill exchange writes each row exactly
once and reads it exactly once, with no global sort machinery; measured
on the bench fixture it is both faster in absolute terms and closer to
linear in cores. On a multi-node cluster the spill directory lives on
the table's shared filesystem (object store), i.e. an external shuffle
— the standard pattern for very wide exchanges (Spark/Cosco-style
push shuffle) — and it makes the exchange itself resumable: a killed
run reuses the recorded spill file list and finished buckets.

Why not ``ds.sort``: a global sort shuffles the same bytes but pays a
sample pass plus per-block tuple sorts, and measured ~no speedup from
8 to 32 CPUs here; explicit quantile buckets keep partition count
= O(cluster width) and make the skew handling explicit — which the
north rule demands anyway.

Skew handling: ~10% of rows are near-duplicates whose phash collides
into a few hot zkeys; all-equal keys would land in one range bucket and
straggle. Hot zkeys (sampled frequency above ``hot_threshold``) are
spread across ``ceil(freq / bucket_capacity)`` consecutive buckets by a
stable hash of image_id — bounded zone-map widening, no straggler. The
intra-zkey order this gives up is meaningless for locality (equal zkey
== same spatial cell).

Resume: the bucket plan (boundaries, hot set, bucket count) is pinned
in a run-level lineage record on first invocation — a resumed run after
a kill must not recompute boundaries from a different sample or cluster
width (same rationale as MERGE's pinned num_buckets). Completed spill
is recorded once (with its exact file list, so orphans from retried
tasks are ignored), and each finished bucket checkpoints its fragments.
"""

from __future__ import annotations

import json
import time
import uuid
from collections import Counter
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..fragments import write_fragment
from ..fs import for_root
from ..manifest import (FragmentMeta, Snapshot, commit, load, read_lineage,
                        write_lineage)
from ..sources.scan import scan
from ..stages.keys import CURVE_KEYS, stable_hash_strings, zorder_key
from ..synth import IMAGES_SCHEMA
from .merge import _chunk_by_bytes

# per-batch caps for the statistics pass: driver state is
# O(num_batches x (SAMPLE_CAP + TOPK)) regardless of zkey cardinality
_SAMPLE_CAP = 512
_TOPK = 64


def _zkey_stats_sampled(root: str, snap: Snapshot, curve: str = "zorder",
                        fragments=None, max_fragments: int = 64):
    """Bounded statistics pass: per-batch weighted zkey sample + top-k
    counts. Reads only (phash, w, h) — a few bytes per row, no image
    payload — from at most ``max_fragments`` fragments.

    Fragment sampling (evenly spaced over the manifest order, weights
    rescaled to the full live-row count) bounds the plan phase at O(1)
    fragments read REGARDLESS of table size — the quantile boundaries
    it feeds are a layout choice, not a correctness input (the spill
    row-count invariant and the sort itself never depend on the plan).
    A hot zkey wholly inside unsampled fragments can miss the salting
    set; the cost is a slow bucket, not a wrong answer.

    Returns (samples, weights, hot_counts: Counter, total_rows).
    ``samples``/``weights`` approximate the zkey distribution (each
    sample point stands for ``weight`` rows); ``hot_counts`` holds
    near-exact counts for keys frequent enough to be in some batch's
    top-k (a globally hot key is locally frequent in the batches that
    contain it). At extreme scale this pass would add one tree-reduce
    level; the driver math is unchanged.
    """
    frags = snap.fragments if fragments is None else list(fragments)
    total_live = sum(f.live_rows for f in frags)
    factor = 1.0
    if len(frags) > max_fragments:
        idx = np.unique(np.linspace(0, len(frags) - 1, max_fragments)
                        .astype(np.int64))
        sampled = [frags[i] for i in idx]
        sampled_live = sum(f.live_rows for f in sampled)
        if sampled_live > 0:
            factor = total_live / sampled_live
            frags = sampled
    ds = scan(root, columns=["phash", "w", "h"],
              fragments=frags, meta_batch_size=8)
    key_fn = CURVE_KEYS[curve]

    def partial(batch: pa.Table) -> pa.Table:
        zk = key_fn(batch["phash"].to_numpy(zero_copy_only=False),
                        batch["w"].to_numpy(zero_copy_only=False),
                        batch["h"].to_numpy(zero_copy_only=False))
        n = len(zk)
        if n == 0:
            return pa.table({"kind": pa.array([], pa.int8()),
                             "zkey": pa.array([], pa.int64()),
                             "wt": pa.array([], pa.float64())})
        zs = np.sort(zk)
        step = max(1, n // _SAMPLE_CAP)
        sample = zs[step // 2::step]
        wt = np.full(len(sample), n / len(sample), dtype=np.float64)
        vals, counts = np.unique(zk, return_counts=True)
        top = np.argsort(counts)[::-1][:_TOPK]
        return pa.table({
            "kind": pa.array(np.concatenate([
                np.zeros(len(sample), dtype=np.int8),
                np.ones(len(top), dtype=np.int8)])),
            "zkey": pa.array(np.concatenate([sample, vals[top]]), pa.int64()),
            "wt": pa.array(np.concatenate([wt, counts[top].astype(np.float64)]),
                           pa.float64()),
        })

    samples, weights = [], []
    hot_counts: Counter = Counter()
    for row in ds.map_batches(partial, batch_size=None,
                              batch_format="pyarrow").take_all():
        if row["kind"] == 0:
            samples.append(row["zkey"])
            weights.append(row["wt"] * factor)
        else:
            hot_counts[row["zkey"]] += int(row["wt"] * factor)
    return (np.asarray(samples, dtype=np.int64),
            np.asarray(weights, dtype=np.float64), hot_counts, total_live)


def estimate_hot_zkeys(root: str, snap: Snapshot, hot_threshold: float) -> set[int]:
    """Hot set from the sampled zkey statistics (public helper)."""
    _, _, hot_counts, total = _zkey_stats_sampled(root, snap)
    if total == 0:
        return set()
    cut = max(2, int(total * hot_threshold))
    return {zk for zk, n in hot_counts.items() if n >= cut}


def _plan_buckets(samples: np.ndarray, weights: np.ndarray,
                  hot_counts: Counter, total: int,
                  num_buckets: int, hot_threshold: float):
    """Quantile boundaries from the weighted sample + per-hot-zkey
    spread widths.

    Returns (boundaries: sorted int64 array of len num_buckets-1,
    hot: dict zkey -> spread bucket count)."""
    if total == 0 or len(samples) == 0:
        return np.array([], dtype=np.int64), {}
    order = np.argsort(samples, kind="stable")
    s = samples[order]
    cum = np.cumsum(weights[order])
    per_bucket = total / num_buckets
    marks = per_bucket * np.arange(1, num_buckets)
    idx = np.searchsorted(cum, marks, side="left").clip(0, len(s) - 1)
    boundaries = s[idx]
    cut = max(2, int(total * hot_threshold))
    hot = {int(k): int(np.ceil(c / per_bucket))
           for k, c in hot_counts.items() if c >= cut}
    return boundaries, hot


def _derive_zb(batch: pa.Table, boundaries: np.ndarray,
               hot: dict[int, int], num_buckets: int, curve: str):
    """Compute (_zkey, _salt, _zb) for a batch (shared by both exchange
    paths). Hot zkeys are spread across a run of buckets by a stable
    hash of image_id (salting)."""
    zk = CURVE_KEYS[curve](batch["phash"].to_numpy(zero_copy_only=False),
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
                num_buckets - 1)
    return zk, salt, zb


class _Derive:
    """Plasma-exchange derive stage: append key columns (and drop rows
    of buckets a resumed run already finished)."""

    def __init__(self, boundaries, hot, num_buckets, curve,
                 done_buckets=()):
        self.boundaries = np.asarray(boundaries, dtype=np.int64)
        self.hot = {int(k): int(v) for k, v in hot.items()}
        self.nb = num_buckets
        self.curve = curve
        self.done = np.asarray(sorted(done_buckets), dtype=np.int64)
        self.__name__ = "ClusterDerive"

    def __call__(self, batch: pa.Table) -> pa.Table:
        zk, salt, zb = _derive_zb(batch, self.boundaries, self.hot,
                                  self.nb, self.curve)
        batch = batch.append_column("_zkey", pa.array(zk, pa.int64()))
        batch = batch.append_column("_salt", pa.array(salt, pa.int64()))
        batch = batch.append_column("_zb", pa.array(zb, pa.int64()))
        if len(self.done):
            batch = batch.filter(pa.array(~np.isin(zb, self.done)))
        return batch


class _WriteBucket:
    """map_groups callable for the plasma exchange: one call per range
    bucket — zero-copy Arrow sort, size-capped fragment writes, and a
    per-bucket lineage checkpoint (same resume granularity as the spill
    path's _BucketSort)."""

    def __init__(self, root, run_id, target_bytes, max_lsn, schema_names,
                 sources, schema_list=None, reencode_psnr=None):
        from ..schema import schema_from_list
        self.root = root
        self.run_id = run_id
        self.target_bytes = target_bytes
        self.max_lsn = max_lsn
        self.schema_names = schema_names
        self.sources = sources
        schema = schema_from_list(schema_list)
        self.schema = schema if schema is not None else IMAGES_SCHEMA
        self.reencode_psnr = reencode_psnr
        self.__name__ = "ClusterBucketWriter"

    def __call__(self, t: pa.Table) -> pa.Table:
        tp = time.perf_counter()
        zb = int(t["_zb"][0].as_py())
        t = t.take(pc.sort_indices(
            t, sort_keys=[("_zkey", "ascending"), ("_salt", "ascending"),
                          ("image_id", "ascending")]))
        out = t.select(self.schema_names).cast(self.schema)
        if self.reencode_psnr is not None:
            from .compact import reencode_table
            out = reencode_table(out, self.reencode_psnr)
        metas = []
        for n, chunk in enumerate(_chunk_by_bytes(out, self.target_bytes)):
            frag_id = f"frag-{self.run_id}-z{zb:05d}-{n:03d}"
            metas.append(write_fragment(self.root, chunk, frag_id,
                                        lineage=self.sources,
                                        max_lsn=self.max_lsn,
                                        zgen=self.run_id))
        write_lineage(self.root, self.run_id, f"zb-{zb:05d}", {
            "kind": "cluster-bucket", "bucket": zb,
            "fragments": [asdict(m) for m in metas],
            "wall_sec": round(time.perf_counter() - tp, 3),
        })
        return pa.table({"meta": pa.array(
            [json.dumps(asdict(m)) for m in metas], pa.string())})


def _spill_dir(run_id: str) -> str:
    """Spill prefix inside the table root (rides the table's own
    filesystem — on a multi-node cluster this is the shared object
    store, i.e. an external shuffle)."""
    return f"tmp/cluster-{run_id}/spill"


class _DeriveSpill:
    """map_batches task: derive (_zkey, _salt, _zb) for its block and
    append one UNCOMPRESSED parquet spill file per bucket it touches
    (image payloads are already compressed; parquet-level codecs here
    would burn CPU for nothing). Returns (zb, rows, file) summary rows —
    only files reported by the completed run are ever read back, so a
    retried task's orphan files are inert."""

    def __init__(self, root: str, run_id: str, boundaries: np.ndarray,
                 hot: dict[int, int], num_buckets: int,
                 curve: str = "zorder"):
        self.root = root
        self.run_id = run_id
        self.boundaries = np.asarray(boundaries, dtype=np.int64)
        self.hot = {int(k): int(v) for k, v in hot.items()}
        self.nb = num_buckets
        self.curve = curve
        self.__name__ = "DeriveSpill"

    def __call__(self, batch: pa.Table) -> pa.Table:
        zk, salt, zb = _derive_zb(batch, self.boundaries, self.hot,
                                  self.nb, self.curve)
        batch = batch.append_column("_zkey", pa.array(zk, pa.int64()))
        batch = batch.append_column("_salt", pa.array(salt, pa.int64()))

        # ONE spill file per task, bucket-aligned row groups: slice the
        # block into per-bucket runs (one stable sort by _zb) and write
        # each run as its own row group. Bucket readers then fetch only
        # their row groups — file count stays O(tasks), not
        # O(tasks x buckets), which matters when the table has hundreds
        # of input fragments.
        order = np.argsort(zb, kind="stable")
        sorted_t = batch.take(pa.array(order))
        zb_sorted = zb[order]
        bounds = np.flatnonzero(np.diff(zb_sorted)) + 1
        starts = np.concatenate([[0], bounds])
        stops = np.concatenate([bounds, [len(zb_sorted)]])
        tag = uuid.uuid4().hex[:12]
        fs = for_root(self.root)
        spill = _spill_dir(self.run_id)
        fs.makedirs(spill)
        rel = f"{tag}.parquet"
        full = fs.full(f"{spill}/{rel}")
        out_zb, out_rows = [], []
        import pyarrow.fs as pafs

        from contextlib import nullcontext

        from ..runtime import page_write_throttle
        local = isinstance(fs.fs, pafs.LocalFileSystem)
        if local:
            # recycle retired scratch pages (pagepool): spill is the
            # suite's biggest single page allocation (~table bytes).
            # The sink throttles itself byte-accurately (warm bytes at
            # full width, first-touch bytes token-gated — capping warm
            # writes too was the round-4 scaling residual)
            from ..pagepool import PooledSink
            sink = PooledSink(full, size_hint=int(sorted_t.nbytes))
        else:
            sink = None
        with page_write_throttle() if sink is None else nullcontext():
            writer = pq.ParquetWriter(
                sink if sink is not None else full + ".tmp",
                sorted_t.schema, compression="NONE",
                filesystem=None if sink is not None else fs.fs)
            try:
                for s, e in zip(starts, stops):
                    part = sorted_t.slice(s, e - s)
                    writer.write_table(part, row_group_size=part.num_rows)
                    out_zb.append(int(zb_sorted[s]))
                    out_rows.append(part.num_rows)
            except BaseException:
                writer.close()
                if sink is not None:
                    sink.abort()
                raise
            writer.close()
        if sink is not None:
            sink.commit()
        else:
            fs.fs.move(full + ".tmp", full)
        n = len(out_zb)
        return pa.table({"zb": pa.array(out_zb, pa.int64()),
                         "rows": pa.array(out_rows, pa.int64()),
                         "file": pa.array([rel] * n, pa.string()),
                         "rg": pa.array(list(range(n)), pa.int64())})


class _BucketSort:
    """map_batches task over bucket ids (batch_size=1): read exactly the
    recorded spill files of one bucket, sort by (zkey, salt, image_id),
    write size-capped fragments + a per-bucket lineage checkpoint.

    ``reencode_psnr`` (not None) additionally re-encodes every image and
    verifies the PSNR/lossless invariant before writing — the fused
    OPTIMIZE path (compact + cluster in ONE rewrite), where the codec
    work rides the exchange instead of paying a second full pass."""

    def __init__(self, root: str, run_id: str, files_ref, target_bytes: int,
                 max_lsn: int, schema_names: list[str], sources: list[str],
                 schema_list: list | None = None,
                 reencode_psnr: float | None = None):
        import ray
        from ..schema import schema_from_list
        self.root = root
        self.run_id = run_id
        self.files = ray.get(files_ref) if hasattr(files_ref, "hex") else files_ref
        self.target_bytes = target_bytes
        self.max_lsn = max_lsn
        self.sources = sources
        schema = schema_from_list(schema_list)
        self.schema = schema if schema is not None else IMAGES_SCHEMA
        self.schema_names = schema_names
        self.reencode_psnr = reencode_psnr
        self.__name__ = "ClusterBucketSort"

    def __call__(self, batch: pa.Table) -> pa.Table:
        fs = for_root(self.root)
        spill = _spill_dir(self.run_id)
        zbs = [int(z) for z in batch["zb"].to_pylist()]
        # one footer parse per spill FILE per task, not per (file,
        # bucket): with ~100 derive spill files x 128 buckets the naive
        # per-bucket open costs ~12k footer parses per job — measured
        # comparable to the codec work itself. Group this task's
        # buckets by file, read all needed row groups per open.
        by_file: dict[str, list[tuple[int, int]]] = {}
        for zb in zbs:
            for f, rg in self.files.get(zb, []):
                by_file.setdefault(f, []).append((int(rg), zb))
        parts_by_zb: dict[int, list[pa.Table]] = {zb: [] for zb in zbs}
        for f, wants in by_file.items():
            pf = pq.ParquetFile(fs.full(f"{spill}/{f}"), filesystem=fs.fs)
            for rg, zb in sorted(wants):
                parts_by_zb[zb].append(pf.read_row_group(rg))
        metas = []
        for zb in zbs:
            tp = time.perf_counter()
            parts = parts_by_zb[zb]
            if not parts:
                continue
            t = pa.concat_tables(parts)
            t = t.take(pc.sort_indices(
                t, sort_keys=[("_zkey", "ascending"), ("_salt", "ascending"),
                              ("image_id", "ascending")]))
            out = t.select(self.schema_names).cast(self.schema)
            if self.reencode_psnr is not None:
                from .compact import reencode_table
                out = reencode_table(out, self.reencode_psnr)
            gmetas = []
            for n, chunk in enumerate(_chunk_by_bytes(out, self.target_bytes)):
                frag_id = f"frag-{self.run_id}-z{int(zb):05d}-{n:03d}"
                gmetas.append(write_fragment(self.root, chunk, frag_id,
                                             lineage=self.sources,
                                             max_lsn=self.max_lsn,
                                             zgen=self.run_id))
            write_lineage(self.root, self.run_id, f"zb-{int(zb):05d}", {
                "kind": "cluster-bucket", "bucket": int(zb),
                "fragments": [asdict(m) for m in gmetas],
                "wall_sec": round(time.perf_counter() - tp, 3),
            })
            metas.extend(gmetas)
        return pa.table({"meta": pa.array(
            [json.dumps(asdict(m)) for m in metas], pa.string())})


def cluster(root: str, *, run_id: str | None = None,
            hot_threshold: float = 0.001,
            num_buckets: int | None = None,
            curve: str = "zorder",
            exchange: str = "spill",
            fragment_target_bytes: int = 128 * 1024 * 1024,
            reencode_psnr: float | None = None,
            only_fragments: list[FragmentMeta] | None = None,
            job_kind: str = "cluster",
            cleanup: str = "inline") -> Snapshot | None:
    """Full-table Z-order/Hilbert rewrite; returns the new snapshot.

    ``exchange`` picks the wide path:
    - ``"spill"`` (default): derive tasks write bucket-aligned row
      groups to the table's own filesystem, bucket tasks read exactly
      their recorded row groups — an external shuffle (Spark/Cosco-
      style) that rides the object store on multi-node deployments,
      keeps plasma out of the wide path, and makes the exchange itself
      resumable (the recorded spill survives a kill). Measured faster
      than plasma on the round-1 fixture (256-row fragments) at both
      widths tried — each image byte is written once and read once,
      while the groupby path hops it through the object store several
      times. CAVEAT (round 2/3): on the current bench fixture
      (64-row fragments, ~470 inputs) both exchanges are dominated by
      the sandbox host's first-touch page path (BENCH/BASELINE.md),
      which swings 100x between runs; the round-2 standalone-cluster
      regression (26→266 s) was that weather, not an exchange
      property, and neither exchange is "strictly" faster under it.
    - ``"plasma"``: derive -> ``groupby(_zb).map_groups`` — the
      Ray-native in-memory exchange; kept for clusters whose object
      store comfortably holds the shard and whose shared filesystem is
      slow. Resume redoes the exchange but still skips finished
      buckets.

    Both paths share the pinned plan, the per-bucket lineage
    checkpoints, and the salted range-bucket math. At 100 TB scale this
    job runs per key-range shard of the table (cluster a shard per
    invocation); the exchange is then bounded by the shard, not the
    table. The sandbox fixture clusters the whole table.
    """
    import ray
    import ray.data as rd

    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.perf_counter()
    snap = load(root)
    if not snap.fragments:
        return None

    # incremental rewrite: only ``only_fragments`` go through the
    # exchange; the rest carry over untouched (Delta OPTIMIZE shape —
    # the 100-TB path never rewrites already-clustered data)
    victims = snap.fragments if only_fragments is None else list(only_fragments)
    if not victims:
        return None
    victim_ids = {f.fragment_id for f in victims}
    retained = [f for f in snap.fragments if f.fragment_id not in victim_ids]

    done = read_lineage(root, run_id)

    # per-phase wall seconds, surfaced in the commit's job metrics (the
    # observable a cluster operator watches to see WHICH phase stopped
    # scaling: plan/stats, the wide exchange, or the bucket sorts)
    phase_sec: dict[str, float] = {}
    tp = time.perf_counter()

    # -- plan: pinned on first invocation (resume must reuse it; a
    # recomputed plan from a different sample or cluster width would
    # re-partition rows across buckets against the done checkpoints)
    params = done.get("params")
    if params:
        NB = int(params["num_buckets"])
        boundaries = np.asarray(params["boundaries"], dtype=np.int64)
        hot = {int(k): int(v) for k, v in params["hot"].items()}
        curve = params.get("curve", curve)
        exchange = params.get("exchange", exchange)
        if params.get("victims") is not None:
            # resume must rewrite the pinned victim set, not a fresh
            # selection over the same snapshot (identical today, but
            # pinning removes the coupling)
            by_id = snap.frag_by_id()
            victims = [by_id[i] for i in params["victims"]]
            victim_ids = set(params["victims"])
            retained = [f for f in snap.fragments
                        if f.fragment_id not in victim_ids]
    else:
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        # floor of 128 / 4x-CPU buckets: bucket count well above CPU
        # width keeps the long tail short (wall ~ sum/width, not the
        # last wave's slowest bucket). Capped by table size (>= ~8 MiB
        # per bucket) so clustering a small table doesn't shatter it
        # into hundreds of tiny fragments — but never below 8 buckets:
        # fewer than ~3 zkey bits of range resolution makes the phash
        # zone maps span the whole domain, defeating the pruning the
        # rewrite exists to provide.
        total_bytes = sum(f.size_bytes for f in victims)
        # the >=8 floor (zkey range resolution for zone maps) applies to
        # full-table rewrites; an incremental victim fold must be able
        # to COLLAPSE a few small fragments into one, and the retained
        # fragments already carry the layout's range resolution
        floor = 8 if only_fragments is None else 1
        cap = max(floor, total_bytes // (8 * 1024 * 1024))
        NB = num_buckets or min(max(128, 4 * n_cpus), cap)
        samples, weights, hot_counts, total = _zkey_stats_sampled(
            root, snap, curve, fragments=victims)
        boundaries, hot = _plan_buckets(samples, weights, hot_counts, total,
                                        NB, hot_threshold)
        write_lineage(root, run_id, "params", {
            "kind": "cluster-params", "num_buckets": NB, "curve": curve,
            "exchange": exchange,
            "victims": (sorted(victim_ids)
                        if only_fragments is not None else None),
            "boundaries": [int(b) for b in boundaries],
            "hot": {str(k): v for k, v in hot.items()}})
    phase_sec["plan"] = round(time.perf_counter() - tp, 3)

    from ..schema import table_schema
    out_schema = table_schema(snap)
    sources = sorted(victim_ids)
    new_metas: list[FragmentMeta] = []
    done_buckets = set()
    for k, rec in done.items():
        if k.startswith("zb-"):
            done_buckets.add(rec["bucket"])
            new_metas.extend(FragmentMeta.from_dict(d)
                             for d in rec["fragments"])

    if exchange == "plasma":
        tp = time.perf_counter()
        ds = scan(root, fragments=victims, schema_list=snap.schema)
        # batch_size=None: fuse-safe (see scan() docstring)
        ds = ds.map_batches(_Derive(boundaries, hot, NB, curve, done_buckets),
                            batch_size=None, batch_format="pyarrow")
        rows = ds.groupby("_zb").map_groups(
            _WriteBucket(root, run_id, fragment_target_bytes, snap.max_lsn,
                         out_schema.names, sources, snap.schema,
                         reencode_psnr),
            batch_format="pyarrow").take_all()
        new_metas.extend(FragmentMeta.from_dict(json.loads(r["meta"]))
                         for r in rows)
        phase_sec["exchange"] = round(time.perf_counter() - tp, 3)
    elif exchange == "spill":
        # -- pass 2a: spill (skipped wholesale on resume once recorded)
        spill_rec = done.get("spill")
        tp = time.perf_counter()
        if spill_rec:
            files_by_bucket = {int(k): v for k, v in spill_rec["files"].items()}
        else:
            # several fragments per derive task: a one-fragment task
            # (~320 rows) sliced across NB=128 buckets writes ~2.5-row
            # spill row groups and leaves every bucket task parsing
            # ~O(fragments) footers — the tiny-read storm measured as
            # the bucket phase's collapse at high width. 4 fragments
            # per task => 4x fewer spill files, 4x larger row groups,
            # bounded task memory (~4 fragments resident).
            ds = scan(root, fragments=victims, schema_list=snap.schema,
                      meta_batch_size=4)
            summary = ds.map_batches(
                _DeriveSpill(root, run_id, boundaries, hot, NB, curve),
                batch_size=None, batch_format="pyarrow").take_all()
            files_by_bucket = {}
            spilled = 0
            for r in summary:
                files_by_bucket.setdefault(int(r["zb"]), []).append(
                    [r["file"], int(r["rg"])])
                spilled += int(r["rows"])
            want_live = sum(f.live_rows for f in victims)
            if spilled != want_live:
                raise AssertionError(
                    f"cluster spill row mismatch: {spilled} != {want_live}")
            write_lineage(root, run_id, "spill", {
                "kind": "cluster-spill",
                "files": {str(k): sorted(v) for k, v in files_by_bucket.items()}})

        phase_sec["spill"] = round(time.perf_counter() - tp, 3)

        # -- pass 2b: per-bucket sort + fragment writes (bucket resume)
        tp = time.perf_counter()
        todo = sorted(b for b in files_by_bucket if b not in done_buckets)
        if todo:
            files_ref = ray.put(files_by_bucket)  # broadcast once
            # bundle a few buckets per task: amortizes spill-footer
            # parses (one per file per TASK) and task dispatch, while
            # keeping >= ~2 waves per slot for load balance. Memory per
            # task stays bounded: bundle x bucket bytes (~bundle x
            # table_bytes/NB).
            n_cpus = int(ray.cluster_resources().get("CPU", 4))
            bundle = max(1, min(4, len(todo) // max(1, 2 * n_cpus)))
            items = rd.from_items([{"zb": b} for b in todo],
                                  override_num_blocks=max(
                                      1, len(todo) // bundle))
            # MLRAY_BUCKET_TASK_CPUS > 1 halves (etc.) the number of
            # CONCURRENT bucket tasks without changing total work —
            # the per-stage concurrency x num_cpus sizing knob for
            # hosts where the stage is bound by a shared per-node
            # resource (page-allocation path, memory bandwidth) rather
            # than cores. Default 1 (healthy hardware: full width).
            import os as _os
            task_cpus = float(_os.environ.get("MLRAY_BUCKET_TASK_CPUS", "1"))
            rows = items.map_batches(
                _BucketSort(root, run_id, files_ref, fragment_target_bytes,
                            snap.max_lsn, out_schema.names, sources,
                            snap.schema, reencode_psnr),
                batch_size=bundle, batch_format="pyarrow",
                num_cpus=task_cpus).take_all()
            new_metas.extend(FragmentMeta.from_dict(json.loads(r["meta"]))
                             for r in rows)
        phase_sec["bucket_sort"] = round(time.perf_counter() - tp, 3)
    else:
        raise ValueError(f"unknown exchange {exchange!r}")

    got = sum(m.rows for m in new_metas)
    want = sum(f.live_rows for f in victims)
    if got != want:
        raise AssertionError(f"cluster row mismatch: wrote {got}, expected {want}")
    new_metas.sort(key=lambda m: m.fragment_id)
    out = commit(root, retained + new_metas, max_lsn=snap.max_lsn,
                 job={"kind": job_kind, "run_id": run_id, "curve": curve,
                      "exchange": exchange,
                      "hot_zkeys": len(hot), "num_buckets": NB,
                      "metrics": {"wall_sec": round(time.perf_counter() - t0, 3),
                                  **{f"{k}_sec": v
                                     for k, v in phase_sec.items()}}},
                 expected_parent=snap.version)
    if cleanup != "defer":
        # "defer" leaves the spill for expire's scratch GC (see
        # merge.merge docstring: bulk frees right after a commit poison
        # the next job's page allocations)
        for_root(root).retire_dir(f"tmp/cluster-{run_id}")
    return out


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
