"""OPTIMIZE: fused compaction + Z-order clustering in ONE rewrite.

Running ``compact`` then ``cluster`` moves every image byte through the
exchange twice (two full read→write passes). Real lakehouse engines
fuse them — Delta's ``OPTIMIZE ... ZORDER BY`` and Iceberg's
``rewrite_data_files(sort_order)`` are a single rewrite that compacts
small files AND applies the clustering order. Moonlink's analog is a
single maintenance pass per snapshot (compaction + index merge both ride
``snapshot_maintenance.rs``; the reference never rewrites twice).

Here the fused op is the cluster exchange with the compaction work
(decode → re-encode → PSNR/lossless verify, the north-rule invariant)
executed inside the per-bucket sort task, where the rows are already in
memory between the spill read and the fragment write. Per-image codec
compute dominates the byte movement, which both raises absolute
throughput (one pass, not two) and keeps the stage compute-bound — the
property that lets it scale near-linearly across cluster sizes, where a
movement-bound pass is capped by per-node memory bandwidth.

Semantics: output snapshot holds exactly the live rows (DVs applied),
re-encoded (idempotent codec ⇒ byte-stable), sorted by the space-filling
curve, in size-capped fragments — identical content to
``cluster(compact(root))`` with one fewer full pass. Resume, lineage
checkpoints, skew salting and the pinned bucket plan are inherited from
``cluster``.
"""

from __future__ import annotations

from ..manifest import FragmentMeta, Snapshot, load
from .cluster import cluster
from .compact import CompactionConfig, select_victims


def select_optimize_victims(snap: Snapshot,
                            cfg: CompactionConfig) -> list[FragmentMeta]:
    """Incremental victim set from manifest stats only (no data read):

    - compaction criteria (``select_victims``): files under
      ``small_file_bytes`` or with >= ``deleted_ratio`` rows deleted —
      moonlink's trigger (``compaction_config.rs:47-54``); plus
    - clustering criterion: fragments with no ``zgen`` provenance,
      i.e. never written in curve order by a cluster/optimize pass —
      fresh MERGE output, appends, bulk loads, compaction output (the
      Delta ZCube-id rule). Fragments a previous pass clustered are
      left alone even though separately-clustered generations may
      overlap in key space: incremental passes converge generation by
      generation (LSM-style), and a periodic ``mode="full"`` collapses
      the generations into one perfect order.
    """
    victims = {f.fragment_id: f for f in select_victims(snap, cfg, "force")}
    for f in snap.fragments:
        if f.zgen is None:
            victims[f.fragment_id] = f
    out = sorted(victims.values(), key=lambda f: f.fragment_id)
    return out[:cfg.max_victims]


def optimize(root: str, *, run_id: str | None = None,
             cfg: CompactionConfig | None = None,
             mode: str = "full",
             hot_threshold: float = 0.001,
             num_buckets: int | None = None,
             curve: str = "zorder",
             exchange: str = "spill",
             cleanup: str = "inline") -> Snapshot | None:
    """One-pass compact + cluster; returns the new snapshot.

    ``mode="full"`` rewrites the whole table; ``mode="incremental"``
    rewrites only the victim set from ``select_optimize_victims`` and
    carries every other fragment over untouched — None if below
    ``cfg.min_victims`` (nothing worth doing). Scan content is
    identical either way; only the physical layout differs.
    """
    cfg = cfg or CompactionConfig()
    only = None
    if mode == "incremental":
        snap = load(root)
        only = select_optimize_victims(snap, cfg)
        if len(only) < cfg.min_victims:
            return None
    elif mode != "full":
        raise ValueError(f"unknown optimize mode {mode!r}")
    return cluster(root, run_id=run_id, hot_threshold=hot_threshold,
                   num_buckets=num_buckets, curve=curve, exchange=exchange,
                   fragment_target_bytes=cfg.output_target_bytes,
                   reencode_psnr=cfg.verify_psnr_db, only_fragments=only,
                   job_kind="optimize", cleanup=cleanup)
