"""Snapshot expire + orphan GC.

Moonlink never implemented snapshot expiry (SURVEY.md §2.5 M8: grep
finds only test comments; old files are removed from the *current*
snapshot via ``set_data_files_to_remove``,
``/root/reference/src/moonlink/src/storage/iceberg/
iceberg_table_syncer.rs:288-302``, and local cache files GC'd,
``table_handler.rs:188-200``, while historical snapshots accumulate).
We implement it per the north rule:

- retain the last K snapshot versions (always including the current);
- compute the set of fragment/DV files reachable from any retained
  snapshot (pure manifest metadata — a driver-side reachability pass
  over the fragment DAG);
- delete unreachable files, including orphans left by aborted runs
  (fragments written but never committed), plus stale lineage sidecar
  dirs and expired snapshot descriptors.

Deletion fans out through a small ``map_batches`` over the file list
when the list is large (on an object store each delete is a round
trip); tiny lists are deleted inline. Must only run while no
maintenance run is in flight — the single-writer driver guarantees
that, mirroring moonlink's single event loop per table.
"""

from __future__ import annotations

import pyarrow as pa

from ..fs import for_root
from ..manifest import (Snapshot, lineage_dir, list_versions, load,
                        pinned_versions)

_RAY_DELETE_THRESHOLD = 512


def _reachable(root: str, versions: list[int]) -> tuple[set[str], set[str]]:
    """(reachable rel paths, retained run_ids) over the given versions."""
    paths: set[str] = set()
    run_ids: set[str] = set()
    for v in versions:
        snap = load(root, v)
        if rid := snap.job.get("run_id"):
            run_ids.add(rid)
        for f in snap.fragments:
            paths.add(f.path)
            if f.dv:
                paths.add(f.dv["path"])
    return paths, run_ids


def _delete_files(root: str, rel_paths: list[str]) -> int:
    if len(rel_paths) >= _RAY_DELETE_THRESHOLD:
        import ray.data as rd

        def rm(batch: pa.Table) -> pa.Table:
            fs = for_root(root)
            n = sum(1 for p in batch["path"].to_pylist() if fs.retire(p))
            return pa.table({"n": pa.array([n], pa.int64())})

        ds = rd.from_items([{"path": p} for p in rel_paths])
        return sum(r["n"] for r in
                   ds.map_batches(rm, batch_format="pyarrow").take_all())
    fs = for_root(root)
    return sum(1 for p in rel_paths if fs.retire(p))


def expire(root: str, *, keep_last: int = 2, clean_orphans: bool = True,
           pin_max_age_s: float = 24 * 3600.0) -> dict:
    """Expire old snapshots; returns a report dict.

    Versions pinned by an active reader (``manifest.pin_snapshot`` —
    the RPC ``scan_table_begin`` handoff) are retained regardless of
    ``keep_last``, so a reader holding a file list never has files
    deleted under it; pins older than ``pin_max_age_s`` are treated as
    leaked (reader died without ``scan_table_end``) and dropped."""
    import time
    t0 = time.perf_counter()
    versions = list_versions(root)
    pinned = pinned_versions(root, max_age_s=pin_max_age_s) & set(versions)
    retained = sorted(set(versions[-max(1, keep_last):]) | pinned)
    expired = [v for v in versions if v not in retained]
    reachable, retained_runs = _reachable(root, retained)

    fs = for_root(root)
    expired_paths, _ = _reachable(root, expired) if expired else (set(), set())
    candidates: list[str] = []
    for sub in ("fragments", "dv"):
        for name in fs.listdir(sub):
            rel = f"{sub}/{name}"
            if rel in reachable:
                continue
            if name.endswith(".tmp") or ".tmp-" in name:
                candidates.append(rel)  # half-written temp: always orphan
            elif clean_orphans or rel in expired_paths:
                candidates.append(rel)

    deleted = _delete_files(root, candidates)

    for v in expired:
        fs.delete(f"snapshots/v{v}.json")

    # stale lineage: runs not referenced by any retained snapshot are
    # either committed-and-expired or aborted; their sidecars are dead.
    removed_lineage = []
    if clean_orphans:
        for rid in fs.listdir("lineage"):
            if rid in retained_runs:
                continue
            d = lineage_dir(root, rid)
            for name in fs.listdir(d):
                fs.delete(f"{d}/{name}")
            fs.delete_dir(d)
            removed_lineage.append(rid)

    # scratch GC: tmp/ holds spill/staging of runs that opted for
    # deferred cleanup (merge/cluster cleanup="defer" — the async
    # scratch-GC deployment pattern) plus debris of aborted runs.
    # Committed runs' scratch is garbage by definition; uncommitted
    # runs' lineage was just removed above under the same flag, so
    # their scratch is equally dead. (Single-writer table: expire never
    # runs concurrently with a maintenance job.)
    removed_tmp = 0
    if clean_orphans:
        for name in fs.listdir("tmp"):
            rel = f"tmp/{name}"
            if fs.is_dir(rel):
                fs.retire_dir(rel)
            else:
                fs.retire(rel)
            removed_tmp += 1

    return {"retained_versions": retained, "expired_versions": expired,
            "pinned_versions": sorted(pinned),
            "deleted_files": deleted, "removed_tmp": removed_tmp,
            "removed_lineage_runs": removed_lineage,
            "metrics": {"wall_sec": round(time.perf_counter() - t0, 3),
                        "deleted_files": deleted,
                        "expired_versions": len(expired)}}
