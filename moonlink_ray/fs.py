"""Pluggable table filesystem (local / S3 / GCS / in-memory / chaos).

Moonlink accesses table storage through a filesystem-accessor trait with
local-fs, S3 and GCS backends plus a chaos wrapper for fault injection
(``/root/reference/src/moonlink/src/storage/filesystem/accessor/``).
This module is the batch engine's seam for the same concern, built on
``pyarrow.fs.FileSystem`` (the public standard Ray Data itself reads
through):

- a table root is a URI or plain path: ``/data/tbl`` or
  ``file:///data/tbl`` (LocalFileSystem), ``s3://bucket/prefix``
  (S3FileSystem), ``gs://bucket/prefix`` (GcsFileSystem),
  ``mock://...`` (in-process _MockFileSystem, for tests);
- every durable read/write in the engine (manifest, fragments, DVs,
  lineage sidecars, cluster spill) goes through a ``TableFS`` resolved
  from the root string, so workers on any node resolve the same storage
  with no shared driver state;
- atomic publication: on a local fs, write-temp-then-rename; on an
  object store a single PUT is already atomic, so the temp dance is
  skipped;
- concurrent-writer safety: ``create_exclusive`` is the conditional put
  of the commit protocol (exactly one committer creates each snapshot
  file; see manifest.commit) — the analog of moonlink's etag-conditional
  ``version-hint.text`` write (``iceberg/file_catalog.rs:259-280``);
- ``ChaosFS`` wraps any backend with seeded fault injection on mutating
  ops (mirrors moonlink's chaos accessor wrapper) — used by the chaos
  tests to prove kill-resume semantics under storage failures.
"""

from __future__ import annotations

import json
import os
import posixpath
import uuid
from typing import Iterable

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq

_MOCK_FS: dict[str, "pafs.FileSystem"] = {}  # name -> shared in-memory fs

# serializes create_exclusive on non-local backends lacking a native
# conditional put (the in-process mock fs; see create_exclusive)
import threading as _threading

_MOCK_LOCK = _threading.Lock()


def _split_scheme(root: str) -> tuple[str, str]:
    if "://" in root:
        scheme, rest = root.split("://", 1)
        return scheme, rest
    return "file", root


def _backend(scheme: str, rest: str):
    """(pyarrow FileSystem, base path inside it, is_object_store)."""
    if scheme == "file":
        return pafs.LocalFileSystem(), rest, False
    if scheme == "mock":
        name, _, path = rest.partition("/")
        fs = _MOCK_FS.setdefault(name, pafs._MockFileSystem())
        return fs, path, True
    if scheme == "s3":
        return pafs.S3FileSystem(), rest, True
    if scheme in ("gs", "gcs"):
        return pafs.GcsFileSystem(), rest, True
    raise ValueError(f"unsupported table-root scheme: {scheme}://")


class TableFS:
    """All storage access of one table root, root-relative paths."""

    def __init__(self, fs: "pafs.FileSystem", base: str, object_store: bool):
        self.fs = fs
        self.base = base.rstrip("/")
        self.object_store = object_store

    @staticmethod
    def for_root(root: str) -> "TableFS":
        scheme, rest = _split_scheme(root)
        if scheme == "chaos":
            # chaos://<p_permille>/<seed>/<inner-root>
            p, seed, inner = rest.split("/", 2)
            return ChaosFS(TableFS.for_root(inner), int(p), int(seed))
        fs, base, obj = _backend(scheme, rest)
        return TableFS(fs, base, obj)

    # -- paths
    def full(self, rel: str = "") -> str:
        return posixpath.join(self.base, rel) if rel else self.base

    # -- small text/json blobs
    def read_text(self, rel: str) -> str:
        with self.fs.open_input_stream(self.full(rel)) as f:
            return f.read().decode()

    def read_bytes(self, rel: str) -> bytes:
        with self.fs.open_input_stream(self.full(rel)) as f:
            return f.read()

    def write_bytes_atomic(self, rel: str, data: bytes) -> None:
        path = self.full(rel)
        if self.object_store:  # single PUT is atomic
            with self.fs.open_output_stream(path) as f:
                f.write(data)
            return
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with self.fs.open_output_stream(tmp) as f:
            f.write(data)
        os.replace(tmp, path)

    def write_text_atomic(self, rel: str, data: str) -> None:
        path = self.full(rel)
        if self.object_store:  # single PUT is atomic
            with self.fs.open_output_stream(path) as f:
                f.write(data.encode())
            return
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with self.fs.open_output_stream(tmp) as f:
            f.write(data.encode())
        self.fs.move(tmp, path)

    def create_exclusive(self, rel: str, data: str) -> bool:
        """Create-if-absent (compare-and-swap on existence): write
        ``data`` to ``rel`` iff no file exists there; returns whether
        this caller won. The commit protocol's conditional put — the
        analog of moonlink's etag-conditional ``version-hint.text``
        write (``/root/reference/src/moonlink/src/storage/iceberg/
        file_catalog.rs:259-280,746-769``), applied here to the
        immutable snapshot file (exactly one committer can create
        ``snapshots/v{N}.json``).

        - local fs: write a temp file, then ``os.link`` it into place —
          link(2) fails atomically with EEXIST if the target exists, the
          POSIX exclusive-create primitive;
        - mock fs (in-process): a per-instance lock around
          check-then-write;
        - real object stores: pyarrow's S3/GCS filesystems expose no
          conditional PUT, so this degrades to check-then-write — the
          narrow TOCTOU there needs the backend's native conditional
          write (S3 If-None-Match / GCS ifGenerationMatch), which is the
          documented integration point; single-writer deployments are
          unaffected.
        """
        path = self.full(rel)
        if isinstance(self.fs, pafs.LocalFileSystem):
            import os
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                f.write(data)
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                return False
            finally:
                os.unlink(tmp)
        with _MOCK_LOCK:
            if self.exists(rel):
                return False
            with self.fs.open_output_stream(path) as f:
                f.write(data.encode())
            return True

    def read_json(self, rel: str) -> dict:
        return json.loads(self.read_text(rel))

    def write_json_atomic(self, rel: str, obj: dict) -> None:
        self.write_text_atomic(rel, json.dumps(obj, sort_keys=True))

    # -- parquet
    def read_parquet(self, rel: str, columns: list[str] | None = None) -> pa.Table:
        return pq.read_table(self.full(rel), columns=columns,
                             filesystem=self.fs)

    def parquet_schema(self, rel: str) -> pa.Schema:
        return pq.read_schema(self.full(rel), filesystem=self.fs)

    def read_parquet_span(self, rel: str, rg_span: list[int],
                          columns: list[str] | None = None) -> pa.Table:
        """Read row groups [rg_span[0], rg_span[1]) of one parquet file
        (adopted-file fragments: several fragments share one file)."""
        pf = pq.ParquetFile(self.full(rel), filesystem=self.fs)
        try:
            return pf.read_row_groups(list(range(rg_span[0], rg_span[1])),
                                      columns=columns)
        finally:
            pf.close()

    def adopt_file(self, src: str, rel: str, *,
                   src_fs: "TableFS | None" = None) -> None:
        """Register an existing immutable parquet file as a table
        artifact WITHOUT rewriting its payload: hardlink when source and
        table share a local device, else a byte copy published with the
        usual write-then-rename discipline. ``src`` is a path inside
        ``src_fs`` (default: the local filesystem), so a source on an
        object-store root (s3://, gs://, mock://) streams through its
        own backend instead of failing on a local ``open()``.
        Idempotent — safe for concurrent adopters of the same file."""
        import shutil
        if self.exists(rel):
            return
        dst = self.full(rel)
        parent = posixpath.dirname(rel)
        if parent:
            self.makedirs(parent)
        src_local = src_fs is None or isinstance(src_fs.fs,
                                                 pafs.LocalFileSystem)
        if src_local and isinstance(self.fs, pafs.LocalFileSystem):
            try:
                os.link(src, dst)
                return
            except FileExistsError:
                return
            except OSError:
                pass  # cross-device -> fall through to the byte copy

        def _open_src():
            if src_local:
                return open(src, "rb")
            return src_fs.fs.open_input_stream(src)

        if self.object_store:
            with _open_src() as fin, \
                    self.fs.open_output_stream(dst) as out:
                shutil.copyfileobj(fin, out, length=8 << 20)
            return
        tmp = dst + f".tmp-{os.getpid()}"
        with _open_src() as fin, \
                self.fs.open_output_stream(tmp) as out:
            shutil.copyfileobj(fin, out, length=8 << 20)
        self.fs.move(tmp, dst)

    def write_parquet_atomic(self, table: pa.Table, rel: str, **kw) -> None:
        from .runtime import page_write_throttle
        path = self.full(rel)
        if self.object_store:
            with page_write_throttle():
                pq.write_table(table, path, filesystem=self.fs, **kw)
            return
        if isinstance(self.fs, pafs.LocalFileSystem):
            # recycle a retired scratch file's warm pages when one is
            # available; same write-temp-then-replace atomicity. The
            # throttle lives INSIDE pooled_write_parquet so recycled
            # (warm-page) writes skip it — see its docstring.
            from .pagepool import pooled_write_parquet
            pooled_write_parquet(table, path, **kw)
            return
        tmp = path + ".tmp"
        with page_write_throttle():
            pq.write_table(table, tmp, filesystem=self.fs, **kw)
        self.fs.move(tmp, path)

    # -- namespace ops
    def exists(self, rel: str) -> bool:
        info = self.fs.get_file_info(self.full(rel))
        return info.type != pafs.FileType.NotFound

    def is_dir(self, rel: str) -> bool:
        info = self.fs.get_file_info(self.full(rel))
        return info.type == pafs.FileType.Directory

    def size(self, rel: str) -> int:
        return self.fs.get_file_info(self.full(rel)).size

    def mtime(self, rel: str) -> float | None:
        """Last-modified time as a POSIX timestamp (None when the
        backend reports none — treat as unknown/old)."""
        mt = self.fs.get_file_info(self.full(rel)).mtime
        return None if mt is None else mt.timestamp()

    def arrival_time(self, rel: str) -> float | None:
        """Newest of (mtime, ctime) — when this PATH appeared here.
        Hardlink adoption (``adopt_file``) preserves the source file's
        mtime but bumps its ctime (link-count change), so orphan-grace
        checks must use this, not mtime alone: a just-linked
        uncommitted export file would otherwise look hours old and be
        swept mid-sync. Object-store adopts are fresh writes, where
        mtime is already the arrival time."""
        if isinstance(self.fs, pafs.LocalFileSystem):
            import os as _os
            try:
                st = _os.stat(self.full(rel))
                return max(st.st_mtime, st.st_ctime)
            except OSError:
                return None
        return self.mtime(rel)

    def makedirs(self, rel: str) -> None:
        self.fs.create_dir(self.full(rel), recursive=True)

    def listdir(self, rel: str) -> list[str]:
        """Base names directly under ``rel`` (empty if missing)."""
        sel = pafs.FileSelector(self.full(rel), recursive=False,
                                allow_not_found=True)
        return sorted(posixpath.basename(i.path)
                      for i in self.fs.get_file_info(sel))

    def delete(self, rel: str) -> bool:
        """Delete one file; False if it did not exist."""
        try:
            self.fs.delete_file(self.full(rel))
            return True
        except (FileNotFoundError, OSError):
            return False

    def delete_dir(self, rel: str) -> None:
        try:
            self.fs.delete_dir(self.full(rel))
        except (FileNotFoundError, OSError):
            pass

    # -- GC deletes (scratch / expired artifacts): on a local fs these
    # recycle the file's warm pages through the node's page pool
    # (pagepool.retire) instead of freeing them; semantically identical
    # to delete/delete_dir — the path is gone either way.
    def retire(self, rel: str) -> bool:
        if isinstance(self.fs, pafs.LocalFileSystem):
            from .pagepool import retire
            return retire(self.full(rel)) != "absent"
        return self.delete(rel)

    def retire_dir(self, rel: str) -> None:
        if isinstance(self.fs, pafs.LocalFileSystem):
            from .pagepool import retire_tree
            retire_tree(self.full(rel))
        else:
            self.delete_dir(rel)


class ChaosFS(TableFS):
    """Seeded fault injection on mutating ops (moonlink's chaos accessor
    analog: ``filesystem/accessor/chaos_wrapper.rs``). Deterministic:
    the k-th mutating op of a process fails iff
    ``hash(seed, k) % 1000 < p_permille``."""

    def __init__(self, inner: TableFS, p_permille: int, seed: int):
        super().__init__(inner.fs, inner.base, inner.object_store)
        self.inner = inner
        self.p = p_permille
        self.seed = seed
        self._k = 0

    def _maybe_fail(self, op: str) -> None:
        self._k += 1
        h = hash((self.seed, self._k)) % 1000
        if h < self.p:
            raise OSError(f"chaos: injected failure on {op} (op #{self._k})")

    def write_text_atomic(self, rel, data):
        self._maybe_fail(f"write_text {rel}")
        return super().write_text_atomic(rel, data)

    def create_exclusive(self, rel, data):
        self._maybe_fail(f"create_exclusive {rel}")
        return super().create_exclusive(rel, data)

    def write_parquet_atomic(self, table, rel, **kw):
        self._maybe_fail(f"write_parquet {rel}")
        return super().write_parquet_atomic(table, rel, **kw)

    def delete(self, rel):
        self._maybe_fail(f"delete {rel}")
        return super().delete(rel)


_CACHE: dict[str, TableFS] = {}


def for_root(root: str) -> TableFS:
    """Resolve (and cache) the TableFS for a root string. Caching keeps
    stateful wrappers (ChaosFS's op counter) stable within a process."""
    fs = _CACHE.get(root)
    if fs is None:
        fs = _CACHE[root] = TableFS.for_root(root)
    return fs
