"""HTTP serving surface — the REST analog of moonlink's service layer.

Moonlink exposes table lifecycle + ingestion over HTTP
(``/root/reference/src/moonlink_service/src/rest_api.rs:196-210``:
health / list / create / drop / ingest / upload / optimize) and a read
handoff over RPC (``moonlink_rpc/src/lib.rs:13-38``,
``scan_table_begin``). This module mirrors that surface 1:1 on the
stdlib threading HTTP server (no extra dependency, one process):

    GET    /health                      liveness
    GET    /tables                      list tables (name, version, rows)
    POST   /tables/{t}                  create: {"schema":[{name,data_type}]}
    DELETE /tables/{t}                  drop
    POST   /ingest/{t}                  {"operation": insert|upsert|delete,
                                         "data": row | [rows], "lsn"?: int}
    POST   /upload/{t}                  {"files": [parquet paths]}  (LoadFiles)
    POST   /tables/{t}/optimize         {"mode"?: full|incremental}
    GET    /tables/{t}/manifest[?version=N]   scan_table_begin analog

Design notes:
- Mutations take a per-table lock (moonlink's single event loop per
  table); reads (manifest, list) are lock-free because snapshots are
  immutable — the same isolation argument as the file handoff.
- Ingest rides the typed JSON converter (sources/json_ingest.py) and
  MERGE, so REST rows get exactly the CDC path's validation and
  semantics; the assigned LSN is returned (the reference's synchronous
  ``request_mode`` reply carries the LSN too, rest_api.rs IngestResponse).
- The server holds NO table state in memory: every request re-reads the
  manifest, so any number of service replicas can front the same store
  (commit conflicts surface as HTTP 409, the conditional-put guarantee).
- Scale: the service is a control plane. Data-plane work (merge,
  optimize) runs as Ray Data jobs; a request is O(rows posted), and the
  handoff reply is O(fragments), never O(table rows).
"""

from __future__ import annotations

import json
import re
import threading
from collections import defaultdict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .fs import for_root
from .manifest import CommitConflict, current_version, init_table, load
from .sources.json_ingest import JsonRowError


class ServiceError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


_NAME_RE = re.compile(r"^[A-Za-z0-9_\-]{1,64}$")


class TableService:
    """Route logic, independent of the HTTP plumbing (unit-testable)."""

    def __init__(self, base: str):
        self.base = base
        self._locks: dict[str, threading.Lock] = defaultdict(threading.Lock)
        self._locks_guard = threading.Lock()

    # ---------------------------------------------------------- helpers
    def _root(self, table: str, *, must_exist: bool = True) -> str:
        if not _NAME_RE.match(table):
            raise ServiceError(400, f"bad table name {table!r}")
        root = f"{self.base}/{table}"
        if must_exist and not for_root(root).exists("snapshots"):
            raise ServiceError(404, f"no such table {table!r}")
        return root

    def _lock(self, table: str) -> threading.Lock:
        with self._locks_guard:
            return self._locks[table]

    # ----------------------------------------------------------- routes
    def health(self) -> dict:
        import time
        return {"service": "moonlink-ray", "status": "healthy",
                "timestamp": int(time.time())}

    def list_tables(self) -> dict:
        fs = for_root(self.base)
        out = []
        for name in sorted(fs.listdir("")) if fs.exists("") else []:
            if not fs.exists(f"{name}/snapshots"):
                continue
            snap = load(f"{self.base}/{name}")
            out.append({"table": name, "version": snap.version,
                        "rows": sum(f.live_rows for f in snap.fragments),
                        "max_lsn": snap.max_lsn})
        return {"tables": out}

    def create_table(self, table: str, body: dict) -> dict:
        from .manifest import commit
        from .schema import type_from_name

        root = self._root(table, must_exist=False)
        with self._lock(table):
            if for_root(root).exists("snapshots"):
                raise ServiceError(409, f"table {table!r} already exists")
            schema_list = None
            if body.get("schema"):
                try:
                    schema_list = [[f["name"],
                                    f.get("data_type", f.get("type"))]
                                   for f in body["schema"]]
                    for _, t in schema_list:
                        type_from_name(t)
                except (KeyError, TypeError, ValueError) as e:
                    raise ServiceError(400, f"bad schema: {e}")
            snap = init_table(root)
            if schema_list:
                snap = commit(root, [], max_lsn=snap.max_lsn,
                              job={"kind": "create", "via": "rest"},
                              schema=schema_list, expected_parent=0)
            return {"table": table, "version": snap.version}

    def drop_table(self, table: str) -> dict:
        root = self._root(table)
        with self._lock(table):
            for_root(root).retire_dir("")
            return {"table": table, "dropped": True}

    def ingest(self, table: str, body: dict) -> dict:
        import uuid

        root = self._root(table)
        op = body.get("operation", "insert")
        if op not in ("insert", "upsert", "delete"):
            raise ServiceError(
                400, f"Invalid operation {op!r}. Must be 'insert', "
                     f"'upsert', or 'delete'")
        data = body.get("data")
        rows = data if isinstance(data, list) else [data]
        if not rows or any(not isinstance(r, dict) for r in rows):
            raise ServiceError(400, "data must be a row object or a "
                                    "non-empty array of row objects")
        with self._lock(table):
            from .sources.json_ingest import ingest_cdc_json

            lsn = body.get("lsn")
            if lsn is None:
                lsn = load(root).max_lsn + 1
            fs = for_root(root)
            rel = f"tmp/rest-{uuid.uuid4().hex[:12]}.jsonl"
            fs.makedirs("tmp")
            fs.write_text_atomic(rel, "\n".join(
                json.dumps({**r, "_op": op, "_lsn": lsn, "_seq": i})
                for i, r in enumerate(rows)))
            try:
                snap = ingest_cdc_json(root, [fs.full(rel)],
                                       strict=bool(body.get("strict", True)))
            except JsonRowError as e:
                raise ServiceError(400, str(e))
            finally:
                fs.retire(rel)
            return {"table": table, "operation": op, "rows": len(rows),
                    "lsn": lsn, "version": snap.version}

    def upload(self, table: str, body: dict) -> dict:
        from .bootstrap import register_parquet_files

        root = self._root(table)
        files = body.get("files")
        if not files or not isinstance(files, list):
            raise ServiceError(400, "files must be a non-empty array "
                                    "of parquet paths")
        with self._lock(table):
            try:
                snap = register_parquet_files(root, files)
            except (FileNotFoundError, ValueError) as e:
                raise ServiceError(400, str(e))
            return {"table": table, "files": len(files),
                    "version": snap.version}

    def optimize(self, table: str, body: dict) -> dict:
        from .pipelines.optimize import optimize

        root = self._root(table)
        mode = body.get("mode", "full")
        if mode not in ("full", "incremental"):
            raise ServiceError(400, f"bad optimize mode {mode!r}")
        with self._lock(table):
            snap = optimize(root, mode=mode)
            return {"table": table, "mode": mode,
                    "version": (snap or load(root)).version}

    def manifest(self, table: str, version: int | None = None) -> dict:
        from .sources.scan import scan_manifest

        root = self._root(table)
        try:
            return scan_manifest(root, version)
        except FileNotFoundError:
            raise ServiceError(404, f"snapshot v{version} not found "
                                    f"(expired or never committed)")

    def status(self, table: str) -> dict:
        root = self._root(table)
        snap = load(root)
        return {"table": table, "version": snap.version,
                "max_lsn": snap.max_lsn, "fragments": len(snap.fragments),
                "rows": sum(f.live_rows for f in snap.fragments)}


# ------------------------------------------------------- HTTP plumbing

_ROUTES = [
    ("GET", re.compile(r"^/health$"), "health"),
    ("GET", re.compile(r"^/tables$"), "list_tables"),
    ("POST", re.compile(r"^/tables/(?P<t>[^/]+)$"), "create_table"),
    ("DELETE", re.compile(r"^/tables/(?P<t>[^/]+)$"), "drop_table"),
    ("POST", re.compile(r"^/ingest/(?P<t>[^/]+)$"), "ingest"),
    ("POST", re.compile(r"^/upload/(?P<t>[^/]+)$"), "upload"),
    ("POST", re.compile(r"^/tables/(?P<t>[^/]+)/optimize$"), "optimize"),
    ("GET", re.compile(r"^/tables/(?P<t>[^/]+)/manifest$"), "manifest"),
    ("GET", re.compile(r"^/tables/(?P<t>[^/]+)/status$"), "status"),
]


def _make_handler(svc: TableService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet test runs
            pass

        def _reply(self, status: int, obj: dict):
            data = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _dispatch(self, method: str):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            for m, rx, fn in _ROUTES:
                if m != method:
                    continue
                got = rx.match(url.path)
                if not got:
                    continue
                args = list(got.groupdict().values())
                try:
                    if method in ("POST",):
                        n = int(self.headers.get("Content-Length") or 0)
                        body = json.loads(self.rfile.read(n) or b"{}")
                        out = getattr(svc, fn)(*args, body)
                    elif fn == "manifest":
                        q = parse_qs(url.query)
                        v = q.get("version", [None])[0]
                        out = svc.manifest(*args,
                                           int(v) if v is not None else None)
                    else:
                        out = getattr(svc, fn)(*args)
                    return self._reply(200, out)
                except ServiceError as e:
                    return self._reply(e.status, {"error": str(e)})
                except json.JSONDecodeError as e:
                    return self._reply(400, {"error": f"bad JSON: {e}"})
                except CommitConflict as e:
                    return self._reply(409, {"error": str(e)})
                except Exception as e:  # the reference's 5xx mapping
                    return self._reply(500, {"error":
                                             f"{type(e).__name__}: {e}"})
            return self._reply(404, {"error": f"no route {method} "
                                              f"{url.path}"})

        def do_GET(self):
            self._dispatch("GET")

        def do_POST(self):
            self._dispatch("POST")

        def do_DELETE(self):
            self._dispatch("DELETE")

    return Handler


def make_server(base: str, port: int = 0,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Bind (port 0 = ephemeral); caller runs serve_forever/shutdown."""
    return ThreadingHTTPServer((host, port),
                               _make_handler(TableService(base)))


def serve(base: str, port: int = 8030, host: str = "127.0.0.1") -> None:
    srv = make_server(base, port, host)
    print(json.dumps({"serving": f"http://{host}:{srv.server_address[1]}",
                      "base": base}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
