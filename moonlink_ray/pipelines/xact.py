"""Streaming-transaction flush/commit/abort across CDC micro-batches.

Moonlink buffers each streaming transaction's rows in a per-xact mem
slice and may FLUSH partial state to disk before the commit arrives
(``/root/reference/src/moonlink/src/storage/mooncake_table/
transaction_stream.rs:17-41``); the WAL records ``StreamFlush`` /
``StreamCommit`` / ``StreamAbort`` events (``storage/wal.rs:78-100``)
and the table makes the transaction visible atomically at its COMMIT
LSN — or never, on abort.

Batch analog: a producer may split one transaction across several CDC
files (its flushes). Rows carry ``_xid``; a control row with
``_op == "commit"`` (resp. ``"abort"``) and that ``_xid`` ends the
transaction, and the commit marker's ``_lsn`` is the transaction's
commit LSN. ``prepare_cdc()`` resolves one micro-batch:

- rows of transactions with no marker yet are STAGED under the table's
  ``xact/{xid}/`` prefix (the flush-buffer analog; a filesystem dir per
  open transaction IS the pending state — no driver-held index) and
  withheld from MERGE;
- a commit marker replays the staged rows plus the in-batch rows with
  ``_lsn`` rewritten to the commit LSN (intra-transaction order rides
  ``_seq``, which the fold already uses to order ops within one LSN) —
  visibility is atomic at commit, the reference's semantics;
- an abort marker deletes the staged rows; nothing reaches MERGE.

Crash safety (every step idempotent):
- staged file names carry a token derived from the SOURCE file name, and
  a re-run clears its own files first — replaying a crashed poll never
  duplicates staged rows, even if the micro-batch is regrouped;
- a replayed commit that already merged is discarded by MERGE's
  floor-LSN rule; the ``xact/{xid}`` dir is removed only AFTER the merge
  commit (``finalize()``), so the crash window re-resolves to a no-op.

Scale: the marker scan and the split pass are column-pruned / streaming
``map_batches`` over the micro-batch only; driver state is O(open
transactions + markers), never O(rows). Contract (documented, like the
follow name-order contract): a commit marker's LSN must exceed the
snapshot's ``max_lsn`` at apply time — Postgres commit LSNs are
monotone, so any LSN-faithful producer satisfies this.

MERGE itself keeps the simpler one-shot semantics: a direct
``merge(root, paths)`` treats its batch as fully committed except
explicit aborts (the batch is applied atomically anyway); marker-driven
visibility is the live FOLLOW protocol's job.
"""

from __future__ import annotations

import hashlib
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fs import TableFS, for_root

_XACT_DIR = "xact"
_MARKERS = ("commit", "abort")


def _file_token(path: str) -> str:
    return hashlib.sha1(os.path.basename(path).encode()).hexdigest()[:12]


def pending_xacts(root: str) -> dict[int, int]:
    """{xid: staged file count} of open (flushed, unresolved) xacts."""
    fs = for_root(root)
    if not fs.exists(_XACT_DIR):
        return {}
    out: dict[int, int] = {}
    for name in fs.listdir(_XACT_DIR):
        rel = f"{_XACT_DIR}/{name}"
        if fs.is_dir(rel):
            out[int(name)] = len(fs.listdir(rel))
    return out


def _scan_markers(xid_paths: list[str]):
    """Column-pruned pass: (commits {xid: commit_lsn}, aborted xid set)."""
    import ray.data as rd

    ds = rd.read_parquet(xid_paths, columns=["_xid", "_op", "_lsn"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b["_op"], value_set=pa.array(_MARKERS)))
        return pa.table({"xid": t["_xid"].cast(pa.int64()),
                         "op": t["_op"].cast(pa.string()),
                         "lsn": t["_lsn"].cast(pa.int64())})

    commits: dict[int, int] = {}
    aborted: set[int] = set()
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        if r["xid"] is None:
            raise ValueError(f"{r['op']} marker without _xid")
        if r["op"] == "abort":
            aborted.add(int(r["xid"]))
        else:
            commits[int(r["xid"])] = max(int(r["lsn"]),
                                         commits.get(int(r["xid"]), -1))
    # an abort wins over any commit marker for the same xid in one batch
    # (can't happen from a sane producer; fail closed = drop)
    for x in aborted:
        commits.pop(x, None)
    return commits, aborted


class _XactSplit:
    """map_batches task over xid-bearing CDC (+ staged flushes of
    committing xacts): route every row —

    - marker rows (commit/abort): control rows, dropped;
    - ``_xid`` null: plain CDC, kept;
    - xid aborted: dropped;
    - xid committed this batch: kept with ``_lsn`` := commit LSN;
    - otherwise (open xact): staged to ``xact/{xid}/{src_token}-*``,
      withheld from the output.

    Output drops ``_xid`` (and the read's ``path`` column) so MERGE sees
    plain CDC and skips its own xid scan entirely."""

    def __init__(self, root: str, commits: dict[int, int], aborted):
        self.root = root
        cx = np.array(sorted(commits), dtype=np.int64)
        self.cx = cx
        self.clsn = np.array([commits[int(x)] for x in cx], dtype=np.int64)
        self.aborted = np.array(sorted(aborted), dtype=np.int64)
        self.__name__ = "XactSplit"

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["path"])
        xid_col = batch["_xid"]
        has_xid = ~np.asarray(xid_col.is_null())
        xid = np.where(has_xid,
                       xid_col.fill_null(0).cast(pa.int64())
                       .to_numpy(zero_copy_only=False), 0)
        op = batch["_op"].to_numpy(zero_copy_only=False)
        marker = np.isin(op, _MARKERS)
        committed = has_xid & np.isin(xid, self.cx) & ~marker
        dead = has_xid & np.isin(xid, self.aborted)
        pending = has_xid & ~committed & ~dead & ~marker
        keep = ~marker & ~dead & ~pending

        if pending.any():
            fs = for_root(self.root)
            stage = batch.filter(pa.array(pending))
            toks = np.array([_file_token(p) for p in paths[pending]])
            sx = xid[pending]
            for x in np.unique(sx):
                xm = sx == x
                fs.makedirs(f"{_XACT_DIR}/{int(x)}")
                for tok in np.unique(toks[xm]):
                    sel = stage.filter(pa.array(xm & (toks == tok)))
                    fs.write_parquet_atomic(
                        sel, f"{_XACT_DIR}/{int(x)}/"
                             f"{tok}-{uuid.uuid4().hex[:8]}.parquet")

        out = batch.filter(pa.array(keep))
        if committed.any():
            lsn = out["_lsn"].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False).copy()
            cm = committed[keep]
            pos = np.searchsorted(self.cx, xid[keep][cm])
            lsn[cm] = self.clsn[pos]
            out = out.set_column(out.column_names.index("_lsn"), "_lsn",
                                 pa.array(lsn, pa.int64()))
        return out.drop_columns(["_xid"])


class PreparedBatch:
    """Result of prepare_cdc: the effective CDC paths plus the
    post-merge cleanup (resolve staged dirs, drop scratch)."""

    def __init__(self, root: str, paths: list[str],
                 resolved: set[int] | None = None,
                 scratch: str | None = None, stats: dict | None = None):
        self.root = root
        self.paths = paths
        self._resolved = resolved or set()
        self._scratch = scratch
        self.stats = stats or {}

    def finalize(self) -> None:
        fs = for_root(self.root)
        for x in self._resolved:
            fs.retire_dir(f"{_XACT_DIR}/{x}")
        if self._scratch:
            fs.retire_dir(self._scratch)


def prepare_cdc(root: str, paths: list[str], *,
                run_id: str) -> PreparedBatch:
    """Resolve streaming-transaction semantics over one CDC micro-batch;
    returns the effective paths to MERGE (possibly empty when every op
    belongs to a still-open transaction)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    xid_paths = [p for p in paths if "_xid" in pq.read_schema(p).names]
    if not xid_paths:
        return PreparedBatch(root, list(paths))

    fs = for_root(root)
    # idempotent re-run: clear staging this batch's source files created
    tokens = {_file_token(p) for p in xid_paths}
    for x in pending_xacts(root):
        for name in fs.listdir(f"{_XACT_DIR}/{x}"):
            if name.split("-", 1)[0] in tokens:
                fs.retire(f"{_XACT_DIR}/{x}/{name}")

    commits, aborted = _scan_markers(xid_paths)
    open_before = pending_xacts(root)
    resolved = (set(commits) | aborted) & set(open_before)

    # replay inputs: staged flushes of transactions committing now
    staged = [fs.full(f"{_XACT_DIR}/{x}/{n}")
              for x in sorted(set(commits) & set(open_before))
              for n in fs.listdir(f"{_XACT_DIR}/{x}")]
    # aborted transactions' staged flushes are simply dropped at finalize

    scratch = f"tmp/xact-{run_id}"
    fs.makedirs(scratch)
    ds = rd.read_parquet(xid_paths + staged, include_paths=True)
    ds = ds.map_batches(_XactSplit(root, commits, aborted),
                        batch_format="pyarrow")
    ds.write_parquet(fs.full(scratch), filesystem=fs.fs)
    main = [fs.full(f"{scratch}/{n}") for n in fs.listdir(scratch)
            if n.endswith(".parquet")]
    # drop zero-row shards (write_parquet may emit empty files)
    main = [p for p in main
            if pq.ParquetFile(p).metadata.num_rows > 0]

    eff = [p for p in paths if p not in set(xid_paths)] + sorted(main)
    resolved |= (set(commits) | aborted)  # incl. xids opened+closed now
    return PreparedBatch(
        root, eff, resolved={x for x in resolved
                             if fs.exists(f"{_XACT_DIR}/{x}")},
        scratch=scratch,
        stats={"commits": len(commits), "aborts": len(aborted),
               "staged_replayed": len(staged),
               "open_after": len(set(open_before) - resolved)})
