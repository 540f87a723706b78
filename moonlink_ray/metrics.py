"""Per-run maintenance metrics.

The north rule requires every stage to checkpoint "per-partition
lineage + metrics". Lineage sidecars (manifest.write_lineage) carry the
per-partition half: fragment ids, row counts, min/max stats, and — added
here — the partition's wall seconds. This module adds the run-level
half: every snapshot commit records what the run did to the table
(rows/fragments/bytes before and after, new/dropped/DV-updated
fragments) plus whatever stage-specific counters the pipeline passes
(wall seconds, CDC op count, bucket count, spill file count, ...).

Metrics live inside ``Snapshot.job["metrics"]`` — durable table
history, surviving lineage GC — and are surfaced by ``engine metrics``
as one JSON line per retained version. Moonlink's analog is the
table-event telemetry in its event loop
(``/root/reference/src/moonlink/src/table_handler.rs``); here the
snapshot chain itself is the telemetry log, which costs nothing extra
at 100 TB scale (metrics are O(1) per commit, computed from manifest
metadata only — no data files are read).
"""

from __future__ import annotations

from .manifest import Snapshot


def snapshot_delta(parent: Snapshot, child: Snapshot) -> dict:
    """O(#fragments) manifest-only diff between two snapshots."""
    pb = parent.frag_by_id()
    cb = child.frag_by_id()
    new = [f for f in child.fragments if f.fragment_id not in pb]
    dropped = [f for f in parent.fragments if f.fragment_id not in cb]
    dv_updated = sum(
        1 for f in child.fragments
        if f.fragment_id in pb and f.dv != pb[f.fragment_id].dv)
    return {
        "rows_before": parent.total_rows,
        "rows_after": child.total_rows,
        "fragments_before": len(parent.fragments),
        "fragments_after": len(child.fragments),
        "new_fragments": len(new),
        "new_bytes": sum(f.size_bytes for f in new),
        "dropped_fragments": len(dropped),
        "dropped_bytes": sum(f.size_bytes for f in dropped),
        "dv_updated": dv_updated,
    }


def history(root: str) -> list[dict]:
    """Metrics for every retained snapshot version, oldest first."""
    from .manifest import list_versions, load

    out = []
    for v in list_versions(root):
        snap = load(root, v)
        out.append({"version": v, "kind": snap.job.get("kind"),
                    "run_id": snap.job.get("run_id"),
                    "metrics": snap.job.get("metrics")})
    return out
