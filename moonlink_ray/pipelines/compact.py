"""Data compaction: rewrite small / heavily-deleted fragments.

Moonlink analog: ``CompactionBuilder`` streams each victim Parquet file,
applies its deletion vector (Arrow ``filter_record_batch``), and concats
rows into size-capped output files
(``/root/reference/src/moonlink/src/storage/compaction/
compactor.rs:170-315``); victims are files below the final-size
threshold or with >=50% rows deleted, min/max victims per round, with
Force/Full overrides (``snapshot_maintenance.rs:42-196``,
``compaction_config.rs:47-54``, ``snapshot_options.rs``).

Ray-Data shape:

    scan(victims, DV applied, tagged _group)
      -> map_batches(ReencodeStage, concurrency=N, batch_size=small)
         (actor pool: codec state held per actor; decode -> re-encode
          -> PSNR-verify, the north-rule invariant)
      -> groupby(_group).map_groups(GroupWriter)
         (one call per output group: sort by image_id, size-capped
          fragment writes, per-group lineage checkpoint)
      -> driver folds the manifest and swaps the pointer.

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
import uuid
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import codec
from ..fragments import write_fragment
from ..manifest import FragmentMeta, Snapshot, commit, load, read_lineage, write_lineage
from ..sources.scan import scan
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


class ReencodeStage:
    """Actor-pool stage: decode -> re-encode every image, verify PSNR.

    Codec/verification state lives in __init__ (once per actor); __call__
    is per batch. Lossless rows must round-trip exactly; lossy rows are
    quantization fixed points, and the PSNR gate proves it.
    """

    def __init__(self, verify_psnr_db: float = 40.0):
        self.verify_psnr_db = verify_psnr_db

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        new_blobs = []
        for buf, fmt in zip(blobs, fmts):
            arr = codec.decode(buf)
            out = codec.encode(arr, fmt)
            if self.verify_psnr_db >= 0:
                dec = codec.decode(out)
                if fmt == "png":
                    if not np.array_equal(arr, dec):
                        raise AssertionError("lossless re-encode changed pixels")
                else:
                    p = codec.psnr(arr, dec)
                    if p < self.verify_psnr_db:
                        raise AssertionError(f"re-encode PSNR {p:.1f} dB < "
                                             f"{self.verify_psnr_db} dB")
            new_blobs.append(out)
        i = batch.column_names.index("bytes")
        return batch.set_column(i, "bytes", pa.array(new_blobs, pa.binary()))


class _GroupWriter:
    """map_groups callable: one call per output group."""

    def __init__(self, root: str, run_id: str, groups_lineage: dict[int, dict],
                 target_bytes: int):
        self.root = root
        self.run_id = run_id
        self.groups_lineage = groups_lineage  # group -> {"sources": [...], "max_lsn": int}
        self.target_bytes = target_bytes
        self.__name__ = "CompactGroupWriter"  # map_groups wraps fn by name

    def __call__(self, group: pa.Table) -> pa.Table:
        gid = int(group["_group"][0].as_py())
        info = self.groups_lineage[gid]
        group = group.take(pc.sort_indices(group["image_id"]))
        out = group.select(IMAGES_SCHEMA.names).cast(IMAGES_SCHEMA)
        metas = []
        for n, chunk in enumerate(_chunk_by_bytes(out, self.target_bytes)):
            frag_id = f"frag-{self.run_id}-g{gid:05d}-{n:03d}"
            metas.append(write_fragment(self.root, chunk, frag_id,
                                        lineage=info["sources"],
                                        max_lsn=info["max_lsn"]))
        write_lineage(self.root, self.run_id, f"group-{gid:05d}", {
            "kind": "compact-group", "group": gid,
            "fragments": [asdict(m) for m in metas],
        })
        return pa.table({"meta": pa.array([json.dumps(asdict(m)) for m in metas],
                                          pa.string())})


def compact(root: str, *, mode: str = "best_effort",
            cfg: CompactionConfig | None = None,
            run_id: str | None = None) -> Snapshot | None:
    """Run one compaction round; returns the new snapshot or None if no-op."""
    import ray.data as rd

    cfg = cfg or CompactionConfig()
    run_id = run_id or uuid.uuid4().hex[:12]
    snap = load(root)
    victims = select_victims(snap, cfg, mode)
    if not victims:
        return None
    groups = plan_groups(victims, cfg.output_target_bytes)
    frag_to_group = {f.fragment_id: g for g, grp in enumerate(groups) for f in grp}
    groups_lineage = {
        g: {"sources": sorted(f.fragment_id for f in grp),
            "max_lsn": max(f.max_lsn for f in grp)}
        for g, grp in enumerate(groups)
    }
    expected_live = sum(f.live_rows for f in victims)

    done = read_lineage(root, run_id)
    done_groups = {rec["group"] for k, rec in done.items() if k.startswith("group-")}
    new_metas = [FragmentMeta.from_dict(d)
                 for k, rec in done.items() if k.startswith("group-")
                 for d in rec["fragments"]]
    todo_frags = [f for f in victims if frag_to_group[f.fragment_id] not in done_groups]

    if todo_frags:
        ds = scan(root, fragments=todo_frags, with_frag=True)

        def tag(batch: pa.Table) -> pa.Table:
            gids = [frag_to_group[fid] for fid in
                    batch["_frag"].to_pylist()]
            return batch.drop_columns(["_frag"]).append_column(
                "_group", pa.array(gids, pa.int64()))

        ds = ds.map_batches(tag, batch_format="pyarrow")
        if cfg.reencode_concurrency:
            ds = ds.map_batches(ReencodeStage, batch_format="pyarrow",
                                batch_size=cfg.reencode_batch_size,
                                concurrency=cfg.reencode_concurrency,
                                fn_constructor_kwargs={
                                    "verify_psnr_db": cfg.verify_psnr_db})
        else:
            ds = ds.map_batches(ReencodeStage(cfg.verify_psnr_db),
                                batch_format="pyarrow",
                                batch_size=cfg.reencode_batch_size)
        written = ds.groupby("_group").map_groups(
            _GroupWriter(root, run_id, groups_lineage, cfg.output_target_bytes),
            batch_format="pyarrow")
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
                       "victims": sorted(victim_ids), "groups": len(groups)},
                  expected_parent=snap.version)
