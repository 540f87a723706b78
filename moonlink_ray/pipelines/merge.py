"""MERGE INTO: apply a CDC batch (insert/upsert/delete @ LSN) to the table.

Moonlink resolves each CDC op with a point index probe because it is
latency-driven streaming (``MemIndex.find_record`` / ``GlobalIndex.
search_values``, ``/root/reference/src/moonlink/src/storage/index/``).
In batch form the same semantics become a shuffle + two cheap column-
pruned passes — no persisted index at all:

1. **Fold** (new versions): hash-bucket the CDC rows on ``image_id``
   (stable hash, B buckets), ``groupby(_bucket).map_groups`` an
   LSN-ordered fold per bucket that applies ops in ``(lsn, seq,
   delete-before-insert)`` order and writes the surviving row versions
   as new fragments. One ``map_groups`` call == one partition == one
   lineage checkpoint, so a killed run resumes bucket-by-bucket.
2. **Tombstone** (old versions): every CDC key with an upsert or delete
   must kill the base copy. Fragments are pruned by min/max zone maps
   against the sorted tombstone key set (the batch analog of moonlink's
   file-index probe), then a per-fragment task reads *only* the
   ``image_id`` column, matches positions, and writes a new cumulative
   deletion-vector sidecar (copy-on-write, mirroring the cumulative DV
   puffin per commit, ``iceberg/iceberg_table_syncer.rs:313-348``).
3. **Commit**: untouched fragments carry over unchanged; a new manifest
   version is swapped in atomically.

Semantics preserved (SURVEY.md §2.4):
- upsert = delete-if-exists + append at one LSN
  (``rest_ingest/moonlink_rest_sink.rs:198-223``);
- within an LSN, ``_seq`` orders ops and delete sorts before insert at
  equal ``(lsn, seq)`` (CDC Update = Delete + Append,
  ``pg_replicate/moonlink_sink.rs:286-317``);
- delete_if_exists is a no-op on miss (``snapshot.rs:795-817``): a
  tombstone key absent from every fragment simply matches nothing;
- a delete at LSN L never kills rows appended at >= L: ops are applied
  in LSN order within the fold, and base rows always predate the CDC
  batch (enforced by the LSN gate below — the visibility rule of
  ``snapshot.rs:782-793``);
- duplicate replay is discarded: ops with ``lsn <= snapshot.max_lsn``
  are dropped, so re-merging an applied batch is a no-op with an
  identical manifest (mirrors ``table_handler.rs:778-784`` and
  test_discard_duplicate_writes, ``table_handler/tests.rs:1626``).

Scale notes (100 TB design): the CDC *key set* (not the rows) is
collected to the driver and broadcast via ``ray.put`` — a
broadcast-semi-join that avoids shuffling the base table entirely; base
fragments are never rewritten (DV-only), so write amplification is
O(CDC) not O(base). If the CDC key set outgrew driver memory, step 2
would switch to a key-range-sharded broadcast (one key shard per
fragment range); the zone-map pruning already partitions that way.
Known simplification vs moonlink: base fragments hold at most one copy
per key (bootstrap + MERGE maintain this), so a tombstone kills all base
positions of its key; FullRow duplicate identity (``moonlink_row.rs:
343-349``) is out of scope for the image_id-keyed table.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fragments import read_fragment, write_dv, write_fragment
from ..manifest import (FragmentMeta, Snapshot, load, commit, read_lineage,
                        write_lineage)
from ..stages.keys import bucket_of, stable_hash_strings
from ..synth import IMAGES_SCHEMA

_OP_RANK = {"delete": 0, "insert": 1, "upsert": 1}
# target bytes of image payload per output fragment chunk
_FRAGMENT_BYTES = 64 * 1024 * 1024


def _fold_bucket(group: pa.Table) -> tuple[np.ndarray, int]:
    """Apply a bucket's ops in total order; return surviving row indices
    (into ``group``) and the max LSN applied.

    Pure index manipulation — image bytes are never materialized as
    Python objects; survivors are taken zero-copy at the end.
    """
    lsn = group["_lsn"].to_numpy(zero_copy_only=False)
    seq = group["_seq"].to_numpy(zero_copy_only=False)
    ops = group["_op"].to_numpy(zero_copy_only=False)
    keys = group["image_id"].to_numpy(zero_copy_only=False)
    rank = np.array([_OP_RANK[o] for o in ops], dtype=np.int8)
    order = np.lexsort((rank, seq, lsn))

    pending: dict[str, list[int]] = {}
    for idx in order:
        op = ops[idx]
        k = keys[idx]
        lst = pending.get(k)
        if op == "insert":
            pending.setdefault(k, []).append(idx)
        elif op == "upsert":
            if lst:
                lst.pop(0)  # delete-if-exists kills one pending version...
            # ...else it falls through to the base copy (tombstone pass)
            pending.setdefault(k, []).append(idx)
        else:  # delete
            if lst:
                lst.pop(0)
            # else: falls through to base (or is a no-op on miss)
    survivors = sorted(i for lst in pending.values() for i in lst)
    max_lsn = int(lsn.max()) if len(lsn) else -1
    return np.asarray(survivors, dtype=np.int64), max_lsn


def _chunk_by_bytes(table: pa.Table, target: int) -> list[pa.Table]:
    """Split a table into chunks of ~target bytes of image payload."""
    if table.num_rows == 0:
        return []
    sizes = pc.binary_length(table["bytes"]).to_numpy(zero_copy_only=False)
    sizes = np.nan_to_num(sizes.astype(np.float64), nan=0.0)
    cum = np.cumsum(sizes)
    chunks, start = [], 0
    while start < table.num_rows:
        base = cum[start - 1] if start else 0.0
        stop = int(np.searchsorted(cum, base + target, side="left")) + 1
        stop = max(stop, start + 1)
        chunks.append(table.slice(start, stop - start))
        start = stop
    return chunks


class _BucketMerge:
    """map_groups callable: one call per hash bucket -> fold + fragment
    write + lineage checkpoint. Returns one meta row per written fragment."""

    def __init__(self, root: str, run_id: str, min_lsn_exclusive: int,
                 schema_list: list | None = None):
        from ..schema import schema_from_list
        self.root = root
        self.run_id = run_id
        self.min_lsn = min_lsn_exclusive
        self.schema = schema_from_list(schema_list) or IMAGES_SCHEMA
        self.__name__ = "BucketMerge"  # map_groups wraps fn by name

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..schema import conform_table
        tp = time.perf_counter()
        bucket = int(group["_bucket"][0].as_py())
        part_key = f"bucket-{bucket:05d}"
        survivors, max_lsn = _fold_bucket(group)
        out = None
        if len(survivors):
            # conform to the table's ACTIVE schema: columns ALTERed in
            # after the CDC batch was produced are null-filled, dropped
            # ones are hidden
            out = conform_table(group.take(survivors), self.schema,
                                keep_extra=())
        metas = []
        if out is not None and out.num_rows:
            for n, chunk in enumerate(_chunk_by_bytes(out, _FRAGMENT_BYTES)):
                frag_id = f"frag-{self.run_id}-b{bucket:05d}-{n:03d}"
                metas.append(write_fragment(self.root, chunk, frag_id,
                                            lineage=[], max_lsn=max_lsn))
        write_lineage(self.root, self.run_id, part_key, {
            "kind": "merge-bucket", "bucket": bucket, "max_lsn": max_lsn,
            "fragments": [asdict(m) for m in metas],
            "wall_sec": round(time.perf_counter() - tp, 3),
        })
        return pa.table({"meta": pa.array([json.dumps(asdict(m)) for m in metas],
                                          pa.string())})


class _DVUpdate:
    """map_batches callable over affected-fragment metas (batch_size=1):
    read only image_id, match tombstone keys, write a new cumulative DV."""

    def __init__(self, root: str, run_id: str, keys_ref):
        self.root = root
        self.run_id = run_id
        self.keys_ref = keys_ref
        self._keys = None  # sorted np array, fetched once per worker

    def _tombstones(self) -> np.ndarray:
        if self._keys is None:
            import ray
            self._keys = ray.get(self.keys_ref)
        return self._keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = self._tombstones()
        out = []
        for row in batch.to_pylist():
            tp = time.perf_counter()
            meta = FragmentMeta.from_dict(json.loads(row["meta"]))
            t = read_fragment(self.root, meta, columns=["image_id"],
                              with_pos=True, apply_dv=False)
            ids = t["image_id"].to_numpy(zero_copy_only=False).astype(str)
            hit = keys[np.searchsorted(keys, ids, side="left").clip(0, len(keys) - 1)] == ids
            new_dead = t["_pos"].to_numpy()[hit]
            if meta.dv:
                from ..fragments import read_dv
                new_dead = np.union1d(new_dead, read_dv(self.root, meta.dv))
            dv_ref = write_dv(self.root, f"dv-{self.run_id}-{meta.fragment_id}",
                              new_dead)
            new_meta = FragmentMeta(**{**asdict(meta), "dv": dv_ref})
            write_lineage(self.root, self.run_id, f"dv-{meta.fragment_id}", {
                "kind": "merge-dv", "fragment_id": meta.fragment_id,
                "meta": asdict(new_meta),
                "wall_sec": round(time.perf_counter() - tp, 3),
            })
            out.append(json.dumps(asdict(new_meta)))
        return pa.table({"meta": pa.array(out, pa.string())})


def _affected_fragments(snap: Snapshot, tombstones: np.ndarray) -> list[FragmentMeta]:
    """Zone-map prune: fragments whose image_id range contains >=1 tombstone."""
    hit = []
    for f in snap.fragments:
        rng = f.stats.get("image_id")
        if not rng or f.rows == 0:
            continue
        lo = np.searchsorted(tombstones, rng[0], side="left")
        hi = np.searchsorted(tombstones, rng[1], side="right")
        if hi > lo:
            hit.append(f)
    return hit


def merge(root: str, cdc_paths: list[str] | str, *, run_id: str | None = None,
          num_buckets: int | None = None) -> Snapshot:
    """Run MERGE INTO and commit a new snapshot; returns it.

    Idempotent: if every CDC op has lsn <= the table's max_lsn the call
    is a no-op returning the current snapshot.
    """
    import ray
    import ray.data as rd

    if isinstance(cdc_paths, str):
        cdc_paths = [cdc_paths]
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.perf_counter()
    snap = load(root)
    floor_lsn = snap.max_lsn

    # -- driver: CDC key/op summary (column-pruned read, no image bytes)
    import pyarrow.parquet as pq
    key_tabs = [pq.read_table(p, columns=["image_id", "_op", "_lsn"])
                for p in cdc_paths]
    key_tab = pa.concat_tables(key_tabs)
    fresh_mask = pc.greater(key_tab["_lsn"], pa.scalar(floor_lsn, pa.int64()))
    key_tab = key_tab.filter(fresh_mask)
    if key_tab.num_rows == 0:
        return snap  # duplicate replay -> no-op
    cdc_max_lsn = int(pc.max(key_tab["_lsn"]).as_py())
    tomb_mask = pc.not_equal(key_tab["_op"], pa.scalar("insert"))
    tombstones = np.unique(
        key_tab.filter(tomb_mask)["image_id"].to_numpy(zero_copy_only=False)
        .astype(str))
    n_ops = key_tab.num_rows

    done = read_lineage(root, run_id)

    # -- bucket count: scales with BOTH the CDC size (bounded fold state
    # per bucket) and the cluster width (a 4N cluster folds 4x as wide).
    # Pinned in a run-level lineage record on the FIRST invocation: a
    # resume after a kill may see a different cluster width, and a
    # recomputed B would silently re-partition keys across buckets,
    # dropping/duplicating CDC rows against the done-bucket checkpoints.
    params = done.get("params")
    if params:
        B = int(params["num_buckets"])
        if num_buckets is not None and num_buckets != B:
            raise ValueError(
                f"resume of run {run_id} pinned num_buckets={B}, "
                f"got {num_buckets}")
    else:
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        # 4x CPU width floor: with B ~= CPUs one wave of buckets makes
        # the wall clock the slowest bucket (skew-bound); 4x keeps the
        # tail short while fold state per bucket stays bounded
        B = num_buckets or int(np.clip(max(n_ops // 500, 4 * n_cpus), 1, 4096))
        write_lineage(root, run_id, "params",
                      {"kind": "merge-params", "num_buckets": B})

    # -- stage 1: DV tombstones on affected base fragments
    dv_metas: dict[str, FragmentMeta] = {}
    affected = _affected_fragments(snap, tombstones) if len(tombstones) else []
    todo = []
    for f in affected:
        rec = done.get(f"dv-{f.fragment_id}")
        if rec:
            dv_metas[f.fragment_id] = FragmentMeta.from_dict(rec["meta"])
        else:
            todo.append(f)
    # per-stage wall seconds for the commit's job metrics (DV and fold
    # run concurrently, so each future times itself)
    stage_sec: dict[str, float] = {}

    def run_dv_stage() -> list:
        if not todo:
            return []
        tp = time.perf_counter()
        keys_ref = ray.put(tombstones)
        items = [{"meta": json.dumps(asdict(f))} for f in todo]
        ds = rd.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(_DVUpdate(root, run_id, keys_ref), batch_size=1,
                             batch_format="pyarrow").take_all()
        stage_sec["dv_sec"] = round(time.perf_counter() - tp, 3)
        return out

    # -- stage 2: bucketed fold of CDC rows -> survivor fragments
    done_buckets = {rec["bucket"] for k, rec in done.items()
                    if k.startswith("bucket-")}
    new_metas: list[FragmentMeta] = []
    for k, rec in done.items():
        if k.startswith("bucket-"):
            new_metas.extend(FragmentMeta.from_dict(d) for d in rec["fragments"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["_lsn"], pa.scalar(floor_lsn, pa.int64())))
        if batch.num_rows == 0:
            return batch.append_column("_bucket", pa.array([], pa.int64()))
        b = bucket_of(batch["image_id"], B)
        batch = batch.append_column("_bucket", pa.array(b, pa.int64()))
        if done_buckets:
            keep = ~np.isin(b, list(done_buckets))
            batch = batch.filter(pa.array(keep))
        return batch

    def run_fold_stage() -> list:
        tp = time.perf_counter()
        cdc = rd.read_parquet(cdc_paths)
        cdc = cdc.map_batches(prep, batch_format="pyarrow")
        folded = cdc.groupby("_bucket").map_groups(
            _BucketMerge(root, run_id, floor_lsn, snap.schema),
            batch_format="pyarrow")
        out = folded.take_all()
        stage_sec["fold_sec"] = round(time.perf_counter() - tp, 3)
        return out

    # stages 1 and 2 are independent until the commit fold (the DV pass
    # touches only base fragments, the fold only CDC rows) — run their
    # Ray pipelines concurrently so neither's fixed latency serializes
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as ex:
        dv_fut = ex.submit(run_dv_stage)
        fold_fut = ex.submit(run_fold_stage)
        dv_rows = dv_fut.result()
        fold_rows = fold_fut.result()
    for r in dv_rows:
        m = FragmentMeta.from_dict(json.loads(r["meta"]))
        dv_metas[m.fragment_id] = m
    for r in fold_rows:
        new_metas.append(FragmentMeta.from_dict(json.loads(r["meta"])))

    # -- commit
    final: list[FragmentMeta] = []
    for f in snap.fragments:
        m = dv_metas.get(f.fragment_id, f)
        if m.live_rows > 0:
            final.append(m)
    final.extend(m for m in new_metas if m.rows > 0)
    final.sort(key=lambda m: m.fragment_id)
    return commit(root, final, max_lsn=max(cdc_max_lsn, floor_lsn),
                  job={"kind": "merge", "run_id": run_id,
                       "cdc_paths": sorted(cdc_paths), "num_buckets": B,
                       "metrics": {"wall_sec": round(time.perf_counter() - t0, 3),
                                   "cdc_ops": n_ops,
                                   "tombstones": len(tombstones),
                                   "dv_fragments": len(dv_metas),
                                   **stage_sec}},
                  expected_parent=snap.version)
