"""Versioned manifest store: the durable table state.

A table root is a directory:

    root/
      version-hint.text        # current snapshot version (atomic pointer)
      snapshots/v{N}.json      # immutable snapshot descriptors
      fragments/*.parquet      # immutable data fragments
      dv/*.parquet             # immutable deletion-vector sidecars (pos:int64)
      lineage/{run_id}/*.json  # per-partition checkpoint sidecars

Moonlink analogs (cited into /root/reference):
- snapshot chain + pointer swap = Iceberg snapshots committed through an
  etag-conditional write of ``version-hint.text``
  (``src/moonlink/src/storage/iceberg/file_catalog.rs:695-770``);
- ``Snapshot.fragments`` = ``disk_files: HashMap<FileRef, DiskFileEntry>``
  (``src/moonlink/src/storage/mooncake_table.rs:156-179``);
- ``max_lsn`` = the ``flush-lsn`` snapshot property
  (``src/moonlink/src/storage/iceberg/iceberg_table_syncer.rs:563-585``);
- per-fragment min/max stats replace moonlink's persisted hash file
  indices (zone maps prune MERGE reads instead of point lookups);
- lineage sidecars replace the WAL for resumability
  (``src/moonlink/src/storage/wal.rs``): a killed run resumes by
  skipping partitions whose sidecar exists.

Snapshot isolation: fragments, DVs and snapshot files are immutable; a
commit writes a brand-new snapshot file then atomically swaps the
pointer, so a reader holding version S sees byte-identical scans before
and after any later commit (the north rule's isolation guarantee).

Only the single driver process commits (mirrors moonlink's single-writer
event loop, ``src/moonlink/src/table_handler.rs:124-214``).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Any

from .fs import for_root

VERSION_HINT = "version-hint.text"


@dataclass
class FragmentMeta:
    fragment_id: str
    path: str                      # relative to table root
    rows: int
    size_bytes: int
    stats: dict[str, list]         # col -> [min, max] zone map
    dv: dict[str, Any] | None = None   # {"path": ..., "count": ...}
    lineage: list[str] = field(default_factory=list)  # source fragment ids
    max_lsn: int = 0
    # clustering provenance: run_id of the cluster/optimize pass that
    # wrote this fragment in curve order, else None (Delta's ZCube-id
    # analog). Incremental OPTIMIZE selects zgen-less fragments; absent
    # in pre-upgrade manifests, where the dataclass default applies.
    zgen: str | None = None
    # adopted-file fragments (MERGE ingests CDC parquet without
    # rewriting payload, the batch analog of moonlink's flushed disk
    # slice BECOMING the data file, ``storage/mooncake_table/
    # disk_slice.rs``): [rg0, rg1, row0] — the fragment is row groups
    # [rg0, rg1) of ``path`` (several fragments may share one physical
    # file), and row0 is the span's first 0-based FILE row (external
    # reader handoff uses it; see scan_manifest). None = whole file.
    # Row positions (``_pos``, DV entries) are span-relative.
    rg_span: list[int] | None = None
    # compact key-hash membership filter (keyfilter.build dict) over the
    # fragment's 64-bit identity hashes — written for FullRow tables so
    # fall-through delete probes dispatch only to fragments that can
    # match (the persisted_bucket_hash_map.rs analog). None on keyed
    # tables (zone maps prune those) and on pre-upgrade manifests.
    keyfilter: dict | None = None

    @property
    def live_rows(self) -> int:
        return self.rows - (self.dv["count"] if self.dv else 0)

    @staticmethod
    def from_dict(d: dict) -> "FragmentMeta":
        return FragmentMeta(**d)


@dataclass
class Snapshot:
    version: int
    parent: int | None
    max_lsn: int
    fragments: list[FragmentMeta]
    job: dict[str, Any] = field(default_factory=dict)  # provenance of the commit
    # active schema as [[name, type_name], ...]; None = bootstrap image
    # schema (see schema.table_schema). Carried forward by every commit,
    # changed only by alter_table.
    schema: list | None = None

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        d = json.loads(s)
        d["fragments"] = [FragmentMeta.from_dict(f) for f in d["fragments"]]
        return Snapshot(**d)

    def frag_by_id(self) -> dict[str, FragmentMeta]:
        return {f.fragment_id: f for f in self.fragments}

    @property
    def total_rows(self) -> int:
        return sum(f.live_rows for f in self.fragments)


def init_table(root: str) -> Snapshot:
    """Create an empty table at ``root`` with snapshot v0."""
    fs = for_root(root)
    for sub in ("snapshots", "fragments", "dv", "lineage", "tmp"):
        fs.makedirs(sub)
    snap = Snapshot(version=0, parent=None, max_lsn=-1, fragments=[],
                    job={"kind": "init"})
    fs.write_text_atomic("snapshots/v0.json", snap.to_json())
    fs.write_text_atomic(VERSION_HINT, "0")
    return snap


def current_version(root: str) -> int:
    """Newest committed version. ``version-hint.text`` is a HINT (the
    Iceberg file-catalog pattern, ``file_catalog.rs:695-770``): commit
    makes the snapshot file itself the linearization point (exclusive
    create), so if a committer dies between snapshot create and hint
    swap — or a slow hint write lands late — the hint can trail; probe
    forward over existing snapshot files to self-heal."""
    fs = for_root(root)
    v = int(fs.read_text(VERSION_HINT).strip())
    while fs.exists(f"snapshots/v{v + 1}.json"):
        v += 1
    return v


def load(root: str, version: int | None = None) -> Snapshot:
    if version is None:
        version = current_version(root)
    return Snapshot.from_json(for_root(root).read_text(
        f"snapshots/v{version}.json"))


def version_at_lsn(root: str, lsn: int) -> int:
    """Newest RETAINED snapshot version with max_lsn <= lsn — the batch
    analog of moonlink's ``scan_table(lsn)`` read-state resolution
    (``/root/reference/src/moonlink/src/union_read/read_state_manager.rs:
    90-164``: a reader asks for table state as of a replication LSN).
    Among equal-max_lsn snapshots (maintenance commits don't advance
    LSN) the newest wins: same rows, better layout."""
    best = None
    for v in list_versions(root):
        s = load(root, v)
        if s.max_lsn <= lsn and (best is None or v > best):
            best = v
    if best is None:
        raise ValueError(f"no retained snapshot at lsn <= {lsn}")
    return best


def list_versions(root: str) -> list[int]:
    out = []
    for name in for_root(root).listdir("snapshots"):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


class CommitConflict(RuntimeError):
    pass


_INHERIT = object()


def commit(root: str, fragments: list[FragmentMeta], *, max_lsn: int,
           job: dict[str, Any], expected_parent: int | None = None,
           schema=_INHERIT) -> Snapshot:
    """Write snapshot v{N+1} and atomically swap the pointer.

    Concurrent-writer safety (moonlink's etag-conditional commit,
    ``file_catalog.rs:259-280,746-769``): the snapshot file itself is
    the linearization point — it is published with a conditional put
    (``TableFS.create_exclusive``), so when two committers race from
    the same parent exactly one creates ``v{N+1}.json`` and the other
    gets ``CommitConflict``. ``expected_parent`` additionally rejects a
    commit whose in-memory plan is based on a stale snapshot.
    ``schema`` defaults to inheriting the parent snapshot's schema, so
    maintenance commits carry an ALTERed schema forward automatically.
    """
    fs = for_root(root)
    cur = current_version(root)
    if expected_parent is not None and cur != expected_parent:
        raise CommitConflict(f"expected parent v{expected_parent}, found v{cur}")
    parent_snap = load(root, cur)
    if schema is _INHERIT:
        schema = parent_snap.schema
    new_version = cur + 1
    snap = Snapshot(version=new_version, parent=cur, max_lsn=max_lsn,
                    fragments=fragments, job=job, schema=schema)
    # run-level metrics: manifest-only delta vs the parent, merged with
    # any stage-specific counters the pipeline passed in job["metrics"]
    from .metrics import snapshot_delta
    job = dict(job)
    job["metrics"] = {**snapshot_delta(parent_snap, snap),
                      **job.get("metrics", {})}
    snap.job = job
    snap_rel = f"snapshots/v{new_version}.json"
    if not fs.create_exclusive(snap_rel, snap.to_json()):
        raise CommitConflict(
            f"snapshot v{new_version} already exists (concurrent commit)")
    fs.write_text_atomic(VERSION_HINT, str(new_version))
    return snap


# ---------------------------------------------------------------- lineage

def lineage_dir(root: str, run_id: str) -> str:
    return f"lineage/{run_id}"


def write_lineage(root: str, run_id: str, part_key: str, record: dict) -> None:
    """Atomically checkpoint one finished partition of a run.

    The record carries {fragments: [FragmentMeta dicts], dvs: [...],
    rows, max_lsn, ...} — the moonlink analog of a WAL entry + flush-LSN
    bookkeeping (``mooncake_table.rs:459-465``), but at partition (not
    row) granularity, which is what batch resumability needs.
    """
    fs = for_root(root)
    d = lineage_dir(root, run_id)
    fs.makedirs(d)
    fs.write_text_atomic(f"{d}/{part_key}.json",
                         json.dumps(record, sort_keys=True))


def read_lineage(root: str, run_id: str) -> dict[str, dict]:
    """Return {part_key: record} for every completed partition of a run."""
    fs = for_root(root)
    d = lineage_dir(root, run_id)
    out: dict[str, dict] = {}
    for name in fs.listdir(d):
        if not name.endswith(".json") or ".tmp-" in name:
            continue
        try:
            out[name[:-5]] = json.loads(fs.read_text(f"{d}/{name}"))
        except (json.JSONDecodeError, OSError):
            # a partially-written sidecar (shouldn't happen: writes are
            # atomic) is treated as not-done
            continue
    return out


def clear_lineage(root: str, run_id: str) -> None:
    fs = for_root(root)
    d = lineage_dir(root, run_id)
    for name in fs.listdir(d):
        fs.delete(f"{d}/{name}")
    fs.delete_dir(d)


# ------------------------------------------------------------------ pins

def pin_snapshot(root: str, version: int, token: str) -> None:
    """Pin ``version`` against expire — the batch analog of moonlink's
    per-connection read-state map (``/root/reference/src/
    moonlink_service/src/rpc_server.rs:168-180``: ``scan_table_begin``
    inserts the table state into a map held until ``scan_table_end`` /
    connection close, so files a reader was handed are never GC'd
    under it). Here the pin is a tiny JSON file under ``pins/`` so it
    works across processes and object stores; ``expire`` unions pinned
    versions into the retained set."""
    import time
    fs = for_root(root)
    fs.makedirs("pins")
    fs.write_text_atomic(f"pins/{token}.json", json.dumps(
        {"version": int(version), "created": time.time()}))


def unpin_snapshot(root: str, token: str) -> bool:
    return for_root(root).delete(f"pins/{token}.json")


def pinned_versions(root: str, *, max_age_s: float | None = None) -> set[int]:
    """Versions currently pinned. Pins older than ``max_age_s`` are
    ignored AND removed (a reader that died without ``scan_table_end``
    — the reference frees its map on connection close; a file pin
    needs a staleness bound instead)."""
    import time
    fs = for_root(root)
    out: set[int] = set()
    now = time.time()
    for name in fs.listdir("pins"):
        if not name.endswith(".json") or ".tmp-" in name:
            continue
        rel = f"pins/{name}"
        try:
            rec = json.loads(fs.read_text(rel))
        except (json.JSONDecodeError, OSError):
            continue
        if max_age_s is not None and now - rec.get("created", 0) > max_age_s:
            fs.delete(rel)
            continue
        out.add(int(rec["version"]))
    return out
