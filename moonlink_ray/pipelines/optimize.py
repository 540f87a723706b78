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

from ..manifest import Snapshot
from .cluster import cluster
from .compact import CompactionConfig


def optimize(root: str, *, run_id: str | None = None,
             cfg: CompactionConfig | None = None,
             hot_threshold: float = 0.001,
             num_buckets: int | None = None,
             curve: str = "zorder",
             exchange: str = "spill") -> Snapshot | None:
    """One-pass compact + cluster; returns the new snapshot."""
    cfg = cfg or CompactionConfig()
    return cluster(root, run_id=run_id, hot_threshold=hot_threshold,
                   num_buckets=num_buckets, curve=curve, exchange=exchange,
                   fragment_target_bytes=cfg.output_target_bytes,
                   reencode_psnr=cfg.verify_psnr_db, job_kind="optimize")
