"""Data compaction: rewrite small / heavily-deleted fragments.

Moonlink analog: ``CompactionBuilder`` streams each victim Parquet file,
applies its deletion vector (Arrow ``filter_record_batch``), and concats
rows into size-capped output files
(``/root/reference/src/moonlink/src/storage/compaction/
compactor.rs:170-315``); victims are files below the final-size
threshold or with >=50% rows deleted, min/max victims per round, with
Force/Full overrides (``snapshot_maintenance.rs:42-196``,
``compaction_config.rs:47-54``, ``snapshot_options.rs``).

Ray-Data shape (shuffle-free):

    Dataset of output-group ids (one block per group)
      -> map_batches(CompactGroupTask, concurrency=N, batch_size=1)
         actor pool; the group plan is broadcast once via ray.put and
         materialized per actor in __init__. Each __call__ compacts ONE
         group end-to-end: read its victim fragments (DV applied),
         sort by image_id, decode -> re-encode -> PSNR-verify (the
         north-rule invariant), write size-capped fragments + lineage.
      -> driver folds the manifest and swaps the pointer.

    Groups are independent by construction (each victim fragment is in
    exactly one group), so compaction needs NO all-to-all exchange: at
    100 TB this is ~800k bounded (~output_target_bytes) tasks pulling
    from an actor pool, instead of a global shuffle.

Victim selection is pure manifest metadata (no data read), exactly like
moonlink's selection over snapshot stats. Output-group membership is a
deterministic bin-packing of the sorted victim list, so a resumed run
(same run_id, same parent snapshot) reproduces identical groups and
skips the checkpointed ones. A group whose rows are all DV-deleted
emits no output fragment (mirrors ``compactor.rs:392-403``), and the
compaction invariant sum(rows out) == sum(live rows in) is checked at
commit (mirrors ``compactor.rs:282-285``).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import codec
from ..fragments import read_fragment, write_fragment
from ..manifest import FragmentMeta, Snapshot, commit, load, read_lineage, write_lineage
from ..synth import IMAGES_SCHEMA
from .merge import _chunk_by_bytes


@dataclass
class CompactionConfig:
    # scaled-down analogs of moonlink's release defaults (16/32 files,
    # 512 MiB final size) sized for the sandbox fixtures
    min_victims: int = 2
    max_victims: int = 4096
    small_file_bytes: int = 32 * 1024 * 1024   # victims: files smaller than this
    deleted_ratio: float = 0.5                 # ... or with >= 50% rows deleted
    output_target_bytes: int = 128 * 1024 * 1024
    verify_psnr_db: float = 40.0               # north-rule invariant; <0 disables
    reencode_concurrency: int | None = None    # actor pool size (None = tasks)
    reencode_batch_size: int = 64              # wide binary rows -> small batches


def select_victims(snap: Snapshot, cfg: CompactionConfig,
                   mode: str = "best_effort") -> list[FragmentMeta]:
    """Pick victim fragments from manifest stats only.

    mode: "best_effort" (threshold policy), "force" (ignore min count),
    "full" (every fragment) — mirrors MaintenanceOption Skip/BestEffort/
    ForceRegular/ForceFull (``snapshot_options.rs``).
    """
    if mode == "full":
        victims = [f for f in snap.fragments]
    else:
        victims = [f for f in snap.fragments
                   if f.size_bytes < cfg.small_file_bytes
                   or (f.rows > 0 and (f.rows - f.live_rows) / f.rows >= cfg.deleted_ratio)]
    victims.sort(key=lambda f: f.fragment_id)
    if mode == "best_effort" and len(victims) < cfg.min_victims:
        return []
    return victims[:cfg.max_victims]


def plan_groups(victims: list[FragmentMeta], target_bytes: int) -> list[list[FragmentMeta]]:
    """Deterministic bin-packing of sorted victims into output groups."""
    groups: list[list[FragmentMeta]] = []
    cur: list[FragmentMeta] = []
    cur_bytes = 0
    for f in victims:
        live_frac = f.live_rows / f.rows if f.rows else 0.0
        est = int(f.size_bytes * live_frac)
        if cur and cur_bytes + est > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += est
    if cur:
        groups.append(cur)
    return groups


def reencode_table(batch: pa.Table, verify_psnr_db: float = 40.0) -> pa.Table:
    """Decode -> re-encode every image row, verify the north-rule
    invariant (lossless: exact round-trip; lossy: PSNR >= gate)."""
    blobs = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    new_blobs = []
    for buf, fmt in zip(blobs, fmts):
        arr = codec.decode(buf)
        out = codec.encode(arr, fmt)
        if verify_psnr_db >= 0:
            dec = codec.decode(out)
            if fmt == "png":
                if not np.array_equal(arr, dec):
                    raise AssertionError("lossless re-encode changed pixels")
            else:
                p = codec.psnr(arr, dec)
                if p < verify_psnr_db:
                    raise AssertionError(f"re-encode PSNR {p:.1f} dB < "
                                         f"{verify_psnr_db} dB")
        new_blobs.append(out)
    i = batch.column_names.index("bytes")
    return batch.set_column(i, "bytes", pa.array(new_blobs, pa.binary()))


class ReencodeStage:
    """Standalone actor-pool map_batches stage wrapping reencode_table
    (kept for pipelines that re-encode outside compaction)."""

    def __init__(self, verify_psnr_db: float = 40.0):
        self.verify_psnr_db = verify_psnr_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        return reencode_table(batch, self.verify_psnr_db)


class CompactGroupTask:
    """Actor-pool stage: one __call__ compacts one output group.

    The group plan (group id -> victim fragment metas + lineage) is
    broadcast once with ``ray.put`` and fetched per actor in __init__ —
    never re-shipped per batch. Each group is read directly with the
    fragment reader (DV applied), so no scan shuffle is needed.
    """

    def __init__(self, root: str, run_id: str, plan_ref,
                 target_bytes: int, verify_psnr_db: float,
                 schema_list: list | None = None):
        import ray
        from ..schema import schema_from_list
        self.root = root
        self.run_id = run_id
        self.plan = ray.get(plan_ref) if hasattr(plan_ref, "hex") else plan_ref
        self.target_bytes = target_bytes
        self.verify_psnr_db = verify_psnr_db
        self.schema = schema_from_list(schema_list) or IMAGES_SCHEMA

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..schema import conform_table
        metas = []
        for gid in batch["group"].to_pylist():
            tp = time.perf_counter()
            info = self.plan[gid]
            frags = [FragmentMeta.from_dict(d) for d in info["frags"]]
            # conform BEFORE concat: victims written under different
            # schema versions (pre/post ALTER) unify on the current one
            tables = [conform_table(read_fragment(self.root, f), self.schema,
                                    keep_extra=()) for f in frags]
            group = pa.concat_tables(tables)
            group = group.take(pc.sort_indices(group["image_id"]))
            out = reencode_table(group, self.verify_psnr_db)
            gmetas = []
            for n, chunk in enumerate(_chunk_by_bytes(out, self.target_bytes)):
                frag_id = f"frag-{self.run_id}-g{gid:05d}-{n:03d}"
                gmetas.append(write_fragment(self.root, chunk, frag_id,
                                             lineage=info["sources"],
                                             max_lsn=info["max_lsn"]))
            write_lineage(self.root, self.run_id, f"group-{gid:05d}", {
                "kind": "compact-group", "group": gid,
                "fragments": [asdict(m) for m in gmetas],
                "wall_sec": round(time.perf_counter() - tp, 3),
            })
            metas.extend(gmetas)
        return pa.table({"meta": pa.array([json.dumps(asdict(m)) for m in metas],
                                          pa.string())})


def compact(root: str, *, mode: str = "best_effort",
            cfg: CompactionConfig | None = None,
            run_id: str | None = None) -> Snapshot | None:
    """Run one compaction round; returns the new snapshot or None if no-op."""
    import ray.data as rd

    cfg = cfg or CompactionConfig()
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.perf_counter()
    snap = load(root)
    victims = select_victims(snap, cfg, mode)
    if not victims:
        return None
    groups = plan_groups(victims, cfg.output_target_bytes)
    plan = {
        g: {"sources": sorted(f.fragment_id for f in grp),
            "frags": [asdict(f) for f in grp],
            "max_lsn": max(f.max_lsn for f in grp)}
        for g, grp in enumerate(groups)
    }
    expected_live = sum(f.live_rows for f in victims)

    done = read_lineage(root, run_id)
    done_groups = {rec["group"] for k, rec in done.items() if k.startswith("group-")}
    new_metas = [FragmentMeta.from_dict(d)
                 for k, rec in done.items() if k.startswith("group-")
                 for d in rec["fragments"]]
    todo_groups = [g for g in plan if g not in done_groups]

    if todo_groups:
        import ray
        plan_ref = ray.put(plan)  # broadcast once, fetched per worker
        ds = rd.from_items([{"group": g} for g in todo_groups],
                           override_num_blocks=len(todo_groups))
        kwargs = dict(root=root, run_id=run_id, plan_ref=plan_ref,
                      target_bytes=cfg.output_target_bytes,
                      verify_psnr_db=cfg.verify_psnr_db,
                      schema_list=snap.schema)
        if cfg.reencode_concurrency:
            # explicit actor pool (the right shape when per-worker state
            # is expensive, e.g. a real codec/model load)
            written = ds.map_batches(
                CompactGroupTask, batch_format="pyarrow", batch_size=1,
                concurrency=cfg.reencode_concurrency,
                fn_constructor_kwargs=kwargs)
        else:
            # default: task pool. Group state is cheap (a ray.get of the
            # broadcast plan from the local object store), and tasks
            # reach full cluster width immediately, while actor pools
            # pay a cold-start ramp per fresh worker process.
            def run_group(batch: pa.Table) -> pa.Table:
                return CompactGroupTask(**kwargs)(batch)

            written = ds.map_batches(run_group, batch_format="pyarrow",
                                     batch_size=1)
        for r in written.take_all():
            new_metas.append(FragmentMeta.from_dict(json.loads(r["meta"])))

    got = sum(m.rows for m in new_metas)
    if got != expected_live:  # compactor.rs:282-285 invariant
        raise AssertionError(
            f"compaction row mismatch: wrote {got}, expected {expected_live}")

    victim_ids = {f.fragment_id for f in victims}
    final = [f for f in snap.fragments if f.fragment_id not in victim_ids]
    final.extend(m for m in new_metas if m.rows > 0)
    final.sort(key=lambda m: m.fragment_id)
    return commit(root, final, max_lsn=snap.max_lsn,
                  job={"kind": "compact", "run_id": run_id, "mode": mode,
                       "victims": sorted(victim_ids), "groups": len(groups),
                       "metrics": {"wall_sec": round(time.perf_counter() - t0, 3),
                                   "victims": len(victims),
                                   "groups": len(groups)}},
                  expected_parent=snap.version)
