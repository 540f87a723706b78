"""Node-local warm-page scratch pool for bulk file writes.

Every bulk artifact this engine writes (cluster spill, rewritten
fragments, DV sidecars, tombstone shards) is create-once / delete-soon
scratch or copy-on-write output. Creating each as a FRESH file means
every byte faults a fresh page; on kernels/hypervisors where
first-touch is expensive that fault cost rivals the compute (measured
on the bench VM: the fault path runs 0.006-11 GB/s and COLLAPSES under
concurrent allocation — see BENCH/BASELINE.md). Deleting scratch frees
the pages, so the next job pays the faults again.

The standard data-plane fix is buffer/file recycling (same class as
allocator retention in ``runtime.tune_allocator``, arena allocators,
or io_uring registered buffers): instead of unlink+create, RETIRE dead
scratch files into a node-local pool and let the next writer ACQUIRE
one and overwrite it in place — tmpfs/page-cache pages of an existing
file are reused, not re-faulted. On real cluster nodes this removes
page-allocation churn and filesystem metadata traffic from the hot
path; on the bench VM it removes the dominant non-scaling cost.

Protocol (multi-process safe, no locks):
- pool dirs are per-device (`MLRAY_POOL_BASES`, default
  ``/dev/shm:/tmp``): rename in/out must stay on one filesystem;
- ``retire(path)`` renames a dead file into the pool (atomic, keeps
  pages warm). Files that are hardlinked elsewhere (st_nlink > 1) are
  NEVER pooled — overwriting them would corrupt the other link — they
  are plain-unlinked instead. Tiny files aren't worth pooling.
- ``acquire(near, hint)`` claims a pool file by atomically renaming it
  to an ``inuse-{pid}-…`` name; rename is the claim — concurrent
  claimants race on the rename and losers just try the next file.
  Preference: smallest file >= the size hint (a larger recycled file
  is truncated to the new length, and truncated tail pages go cold),
  else the largest available (warm prefix + fresh tail).
- ``PooledSink`` writes THROUGH a claimed file and publishes with
  ``os.replace`` — the same write-then-atomic-rename publication
  discipline as ``TableFS.write_parquet_atomic``; a crash mid-write
  leaves an ``inuse-`` orphan that the next acquire scavenges (its
  stale bytes are never read, only overwritten).

Knobs: ``MLRAY_PAGE_POOL=0`` disables; ``MLRAY_POOL_CAP_GB`` caps each
pool dir (default 24; beyond it retire degrades to unlink);
``MLRAY_POOL_BASES`` relocates the pool dirs.
"""

from __future__ import annotations

import os
import shutil
import uuid

_MIN_POOL_BYTES = 1 << 20  # files below this aren't worth recycling
_POOL_NAME = "mlray-page-pool"


def enabled() -> bool:
    return os.environ.get("MLRAY_PAGE_POOL", "1") != "0"


def _cap_bytes() -> int:
    return int(float(os.environ.get("MLRAY_POOL_CAP_GB", "36")) * (1 << 30))


def _bases() -> list[str]:
    raw = os.environ.get("MLRAY_POOL_BASES", "/dev/shm:/tmp")
    return [b for b in raw.split(":") if b]


def _pool_dir_for(path: str) -> str | None:
    """Pool dir on the same device as ``path`` (else None: rename-based
    recycling can't cross filesystems)."""
    try:
        dev = os.stat(os.path.dirname(os.path.abspath(path)) or "/").st_dev
    except OSError:
        return None
    for base in _bases():
        try:
            if os.stat(base).st_dev == dev and os.access(base, os.W_OK):
                d = os.path.join(base, _POOL_NAME)
                os.makedirs(d, exist_ok=True)
                return d
        except OSError:
            continue
    return None


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except OSError:
        return True


def _scavenge(pool: str, entries) -> list[str]:
    """Return inuse- orphans of dead processes to the pool; returns the
    reclaimed pool paths (so the caller can consider them immediately)."""
    reclaimed = []
    for e in entries:
        if not e.name.startswith("inuse-"):
            continue
        try:
            pid = int(e.name.split("-")[1])
        except (IndexError, ValueError):
            pid = 0
        if not _pid_alive(pid):
            back = os.path.join(pool, f"p-{uuid.uuid4().hex}")
            try:
                os.rename(e.path, back)
                reclaimed.append(back)
            except OSError:
                pass
    return reclaimed


def acquire(near: str, size_hint: int = 0) -> str | None:
    """Claim a recycled file on ``near``'s device; None if unavailable."""
    if not enabled():
        return None
    pool = _pool_dir_for(near)
    if pool is None:
        return None
    try:
        entries = list(os.scandir(pool))
    except OSError:
        return None
    cands = []
    for path in _scavenge(pool, entries):
        try:
            cands.append((os.path.getsize(path), path))
        except OSError:
            continue
    for e in entries:
        if not e.name.startswith("p-"):
            continue
        try:
            cands.append((e.stat().st_size, e.path))
        except OSError:
            continue
    if not cands:
        return None
    fits = sorted(c for c in cands if c[0] >= size_hint)
    ordered = fits + sorted((c for c in cands if c[0] < size_hint),
                            reverse=True)
    for _, path in ordered:
        claimed = os.path.join(pool, f"inuse-{os.getpid()}-{uuid.uuid4().hex}")
        try:
            os.rename(path, claimed)
            return claimed
        except OSError:  # lost the race; try the next candidate
            continue
    return None


def _pool_bytes(pool: str) -> int:
    total = 0
    try:
        for e in os.scandir(pool):
            try:
                total += e.stat().st_size
            except OSError:
                pass
    except OSError:
        pass
    return total


def retire(path: str) -> str:
    """Remove ``path``, recycling its pages when possible.

    Returns "pooled" | "deleted" | "absent". Hardlinked files
    (st_nlink > 1 — e.g. bench fixture clones) are never pooled:
    a later in-place overwrite would corrupt the surviving link."""
    try:
        st = os.lstat(path)
    except OSError:
        return "absent"
    import stat as stat_mod
    poolable = (enabled() and stat_mod.S_ISREG(st.st_mode)
                and st.st_nlink == 1 and st.st_size >= _MIN_POOL_BYTES)
    if poolable:
        pool = _pool_dir_for(path)
        if pool is not None and _pool_bytes(pool) + st.st_size <= _cap_bytes():
            try:
                os.rename(path, os.path.join(pool, f"p-{uuid.uuid4().hex}"))
                return "pooled"
            except OSError:
                pass
    try:
        os.unlink(path)
        return "deleted"
    except OSError:
        return "absent"


def retire_tree(path: str) -> dict:
    """rmtree that retires every poolable file first."""
    counts = {"pooled": 0, "deleted": 0, "absent": 0}
    for dirpath, _dirnames, filenames in os.walk(path):
        for name in filenames:
            counts[retire(os.path.join(dirpath, name))] += 1
    shutil.rmtree(path, ignore_errors=True)
    return counts


def release(claimed: str) -> None:
    """Return an acquired-but-unconsumed file to the pool."""
    pool = os.path.dirname(claimed)
    try:
        os.rename(claimed, os.path.join(pool, f"p-{uuid.uuid4().hex}"))
    except OSError:
        try:
            os.unlink(claimed)
        except OSError:
            pass


class PooledSink:
    """Write-then-atomically-publish sink over a recycled file.

    Behaves like ``open(tmp, "wb")`` + ``os.replace(tmp, final)`` but
    reuses a pool file's warm pages when one is available (falling back
    to a fresh temp file next to the destination). The sink is a valid
    pyarrow output target (``pq.write_table(t, sink)`` /
    ``pq.ParquetWriter(sink, schema)``); pyarrow does not close
    caller-provided sinks, so callers finish with ``commit()`` (or
    ``abort()`` on failure). ``truncate()`` at close clips the recycled
    file's stale tail — without it the parquet footer would not be at
    EOF and every reader would see a corrupt file.

    Throttling is byte-accurate and built in: bytes that overwrite the
    recycled file's already-host-faulted pages run at full width (they
    never touch the host fault path), while bytes past the recycled
    length — and every byte of a fresh-file fallback — first take a
    node write token (``runtime.acquire_write_token``), because THOSE
    are first-touch faults. ``acquire`` may hand back a file smaller
    than the hint, so a recycled sink can still cross into throttled
    territory mid-write; the token is taken lazily at the crossing and
    held until close."""

    def __init__(self, final_path: str, size_hint: int = 0):
        self.final_path = final_path
        self._claimed = acquire(final_path, size_hint)
        if self._claimed is not None:
            self._path = self._claimed
            self._warm_bytes = os.path.getsize(self._path)
            self._f = open(self._path, "r+b")
        else:
            self._path = f"{final_path}.tmp-{uuid.uuid4().hex[:8]}"
            self._warm_bytes = 0
            self._f = open(self._path, "wb")
        self.closed = False
        self._published = False
        self._token: int | None = None
        self._token_checked = False

    @property
    def recycled(self) -> bool:
        return self._claimed is not None

    # file-like surface (what pyarrow's PythonFile needs)
    def write(self, b) -> int:
        if not self._token_checked and \
                self._f.tell() + len(b) > self._warm_bytes:
            from .runtime import acquire_write_token
            self._token = acquire_write_token()
            self._token_checked = True
        return self._f.write(b)

    def flush(self) -> None:
        self._f.flush()

    def tell(self) -> int:
        return self._f.tell()

    def writable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def readable(self) -> bool:
        return False

    def close(self) -> None:
        if not self.closed:
            self.closed = True
            self._f.truncate()
            self._f.close()
            if self._token is not None:
                from .runtime import release_write_token
                release_write_token(self._token)
                self._token = None

    def commit(self) -> None:
        """Publish atomically at the final path."""
        self.close()
        os.replace(self._path, self.final_path)
        self._published = True

    def abort(self) -> None:
        if self._published:
            return
        self.close()
        if self._claimed is not None:
            release(self._path)
        else:
            try:
                os.unlink(self._path)
            except OSError:
                pass


def pooled_write_parquet(table, final_path: str, **pq_kwargs) -> bool:
    """``pq.write_table`` + atomic publish through the pool. Always
    succeeds (falls back to a plain temp file when the pool is empty);
    the return reports whether pages were recycled.

    Throttling is handled inside the sink, byte-accurately: warm
    (recycled) bytes run at full width, first-touch bytes — a pool
    miss, or the tail beyond a smaller recycled file — take a node
    write token. Capping warm writes too was the round-4 scaling
    residual (optimize spill 1.9x between 8 and 32 CPUs)."""
    import pyarrow.parquet as pq

    sink = PooledSink(final_path, size_hint=int(table.nbytes))
    try:
        pq.write_table(table, sink, **pq_kwargs)
        sink.commit()
    except BaseException:
        sink.abort()
        raise
    return sink.recycled


def _fill_worker(args) -> int:
    pool, n_files, file_mb, deadline = args
    import time

    from .runtime import page_write_throttle
    chunk = b"\xa5" * (8 << 20)
    added = 0
    for _ in range(n_files):
        if time.time() > deadline:
            break
        tmp = os.path.join(pool, f"inuse-{os.getpid()}-{uuid.uuid4().hex}")
        with page_write_throttle(), open(tmp, "wb") as f:
            for _ in range(file_mb // 8):
                f.write(chunk)
        added += os.path.getsize(tmp)
        os.rename(tmp, os.path.join(pool, f"p-{uuid.uuid4().hex}"))
    return added


def fill(near: str, target_gb: float, budget_s: float = 240.0,
         file_mb: int = 64, workers: int = 8) -> float:
    """Pre-populate the pool with warm-page files (bench warmup: pays
    the first-touch faults OUTSIDE the timed window, exactly like a
    long-lived node whose frames were faulted at boot). Fans out to
    ``workers`` processes — the host fault path peaks at ~8-way
    concurrency (BENCH/BASELINE.md) — and is time-bounded so a
    bad-weather host can't stall the caller. Returns GB added."""
    import time
    from multiprocessing import Pool

    pool = _pool_dir_for(near)
    if pool is None or not enabled():
        return 0.0
    cap = _cap_bytes()
    target = min(int(target_gb * (1 << 30)), cap)
    missing = target - _pool_bytes(pool)
    if missing <= 0:
        return 0.0
    n_files = -(-missing // (file_mb << 20))
    per = [int(n_files // workers + (i < n_files % workers))
           for i in range(workers)]
    deadline = time.time() + budget_s
    with Pool(workers) as p:
        added = sum(p.map(_fill_worker,
                          [(pool, n, file_mb, deadline) for n in per if n]))
    return added / 1e9


def stats(near: str = "/tmp") -> dict:
    pool = _pool_dir_for(near)
    if pool is None:
        return {"pool": None, "bytes": 0, "files": 0}
    n = sum(1 for e in os.scandir(pool) if e.name.startswith("p-"))
    return {"pool": pool, "bytes": _pool_bytes(pool), "files": n}
