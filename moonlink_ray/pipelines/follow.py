"""FOLLOW: continuous CDC ingestion — the live variant of S1.

Moonlink's Postgres source is an always-on replication loop: the event
loop drains the slot, folds each commit into the mooncake table, and
advances ``flush_lsn`` monotonically
(``/root/reference/src/moonlink_connectors/src/pg_replicate/``,
``table_handler.rs`` event loop). The batch analog here tails a
directory that a producer drops CDC parquet files into (the standard
object-store handoff: Debezium/replication workers upload closed files,
the lakehouse engine applies them):

- each poll lists the directory, takes the files not yet applied (in
  sorted-name order == producer LSN order), and runs ONE ``merge`` over
  the batch — micro-batching, so a burst of small files still costs a
  single shuffle;
- a cursor sidecar (``follow.cursor.json``, atomic publish) records the
  applied file names. Crash between merge-commit and cursor-write is
  safe: MERGE discards ops with ``lsn <= snapshot.max_lsn``, so the
  re-merge after restart is a no-op with an identical manifest (the
  ``initial_persistence_lsn`` discard rule, SURVEY.md §2.8);
- stops after ``idle_cycles`` consecutive empty polls (batch/test use)
  or runs forever with ``idle_cycles=None`` (service use);
- streaming transactions (rows carrying ``_xid``) may span files: their
  ops are staged and become visible atomically at their commit marker's
  LSN, or never on abort — the StreamFlush/StreamCommit/StreamAbort
  protocol (see ``pipelines/xact.py``).

At 100 TB the poll is O(directory listing) and each micro-batch costs
exactly one MERGE (zone-map-pruned, DV-only writes) — the table never
rewrites for ingest, matching moonlink's O(delta) write amplification.
"""

from __future__ import annotations

import json
import time

from ..fs import TableFS
from ..manifest import Snapshot, load
from .merge import merge

_CURSOR = "follow.cursor.json"


class OutOfOrderCdcFile(RuntimeError):
    """A CDC file sorted BEFORE an already-applied file appeared late.

    The follow contract is sorted-filename order == producer LSN order
    (the object-store handoff convention). If a producer violates it,
    merge's floor-LSN rule (ops with lsn <= snapshot.max_lsn are
    discarded) would silently drop every op of the late file — permanent
    data loss. Fail loudly instead; the operator must replay the file
    with fresh LSNs (or bump its name past the cursor's high-water mark).
    """


def _read_cursor(tfs: TableFS) -> tuple[set[str], str]:
    if not tfs.exists(_CURSOR):
        return set(), ""
    d = json.loads(tfs.read_text(_CURSOR))
    applied = set(d.get("applied", []))
    return applied, d.get("max_applied", max(applied, default=""))


def _write_cursor(tfs: TableFS, applied: set[str]) -> None:
    tfs.write_text_atomic(_CURSOR, json.dumps(
        {"applied": sorted(applied),
         "max_applied": max(applied, default="")}, indent=1))


def poll_once(root: str, cdc_dir: str, *, run_id: str | None = None,
              num_buckets: int | None = None) -> tuple[Snapshot | None, int]:
    """Apply any unapplied CDC files; returns (snapshot, files_applied).

    snapshot is None when the poll found nothing new. Raises
    OutOfOrderCdcFile if a new file sorts before the newest applied
    name (see the exception docstring — silently merging it would lose
    its ops to the floor-LSN discard).
    """
    import os

    tfs = TableFS.for_root(root)
    applied, max_applied = _read_cursor(tfs)
    names = sorted(n for n in os.listdir(cdc_dir)
                   if n.endswith(".parquet") and n not in applied)
    if not names:
        return None, 0
    if max_applied and names[0] < max_applied:
        late = [n for n in names if n < max_applied]
        raise OutOfOrderCdcFile(
            f"CDC file(s) {late} sort before already-applied "
            f"{max_applied!r}; their ops would be silently discarded by "
            f"the floor-LSN rule. Replay them with fresh LSNs/names.")
    import uuid

    from .xact import prepare_cdc

    run_id = run_id or uuid.uuid4().hex[:12]
    prep = prepare_cdc(root, [os.path.join(cdc_dir, n) for n in names],
                       run_id=run_id)
    if prep.paths:
        snap = merge(root, prep.paths, run_id=run_id,
                     num_buckets=num_buckets)
    else:  # every op belongs to a still-open streaming xact
        snap = load(root)
    prep.finalize()
    _write_cursor(tfs, applied | set(names))
    return snap, len(names)


def follow(root: str, cdc_dir: str, *, poll_interval: float = 1.0,
           idle_cycles: int | None = 3,
           max_cycles: int | None = None) -> dict:
    """Tail ``cdc_dir`` and merge new CDC files until idle; returns
    summary counters. ``idle_cycles=None`` follows forever."""
    cycles = idle = files = merges = 0
    last_version = load(root).version
    while True:
        snap, n = poll_once(root, cdc_dir)
        cycles += 1
        if n == 0:
            idle += 1
            if idle_cycles is not None and idle >= idle_cycles:
                break
        else:
            idle = 0
            files += n
            merges += 1
            last_version = snap.version
        if max_cycles is not None and cycles >= max_cycles:
            break
        time.sleep(poll_interval)
    return {"cycles": cycles, "files_applied": files, "merges": merges,
            "version": last_version}
