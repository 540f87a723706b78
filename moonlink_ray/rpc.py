"""Socket RPC surface — the ``moonlink_rpc`` analog.

Moonlink exposes a second, lower-level serving surface next to REST: a
length-prefixed binary RPC over Unix/TCP sockets
(``/root/reference/src/moonlink_rpc/src/lib.rs:27-38`` declares the
verbs; ``moonlink_service/src/rpc_server.rs:93-186`` serves them). This
module mirrors that surface verb-for-verb on the stdlib socketserver:

    create_snapshot(database, table, lsn)      force an interop sync at lsn
    create_table(database, table, schema, table_config)
    drop_table(database, table)
    get_parquet_metadatas(data_files)          per-file footer metadata
    get_table_schema(database, table)          Arrow IPC schema bytes
    list_tables()                              cardinality + lsn per table
    load_files(database, table, files)         parquet bulk registration
    optimize_table(database, table, mode)
    scan_table_begin(database, table, lsn)     pinned reader handoff
    scan_table_end(database, table)            release the pin

Wire format: 4-byte little-endian length + UTF-8 JSON body (the
reference frames bincode the same way, ``lib.rs:40-56``; JSON is the
language-neutral public analog — any client with a socket and a JSON
parser can speak it). Request ``{"op": <verb>, ...params}``; response
``{"ok": true, "result": ...}`` or ``{"ok": false, "error": "..."}``.
Errors are per-request: the connection survives a failed call, exactly
like the reference's ``Error`` enum travelling over the same stream.

Semantics mapped to the batch engine:

- ``scan_table_begin`` returns the ``scan_manifest`` reader handoff
  (file list + DV sidecars + row spans) for the newest snapshot whose
  ``max_lsn <= lsn`` (or the current snapshot when lsn is null) and
  PINS that version (``manifest.pin_snapshot``) so ``expire`` cannot
  delete its files while the reader holds them — the analog of
  rpc_server.rs:168-180 keeping the read state in a per-connection map.
  The pin is released by ``scan_table_end`` or on connection close
  (and, as a leak bound, by ``expire``'s ``pin_max_age_s``).
- ``create_snapshot(lsn)`` is moonlink's "force an Iceberg snapshot at
  lsn" (``moonlink_backend`` ``create_snapshot``): the batch analog
  requires the table to have already committed past ``lsn`` (the
  reference BLOCKS until flush reaches lsn; a batch engine errors so
  the caller retries after its producer merges) and then syncs the
  table's configured interop exports (``export.iceberg_dest`` /
  ``export.delta_dest`` in the table config).
- ``get_table_schema`` returns genuine Arrow IPC stream bytes
  (base64-encoded in the JSON frame) — byte-compatible with the
  reference's ``StreamWriter`` reply (rpc_server.rs:139-143).
- ``get_parquet_metadatas`` returns per-file footer facts as JSON
  (rows, row groups, schema, sizes) rather than thrift blobs: the
  reference ships opaque bytes to its own pg extension; an open
  engine's callers want something any language can read.

Scale: every verb is O(metadata) — file lists, footers, schema — never
O(table rows); data-plane work (optimize, the actual scan IO) runs as
Ray Data jobs outside the socket. The server holds no table state
between requests (pins live on the table filesystem), so replicas can
front the same store.
"""

from __future__ import annotations

import base64
import io
import json
import socket
import socketserver
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from .fs import for_root
from .manifest import load, pin_snapshot, unpin_snapshot
from .service import ServiceError, TableService, _NAME_RE

_MAX_FRAME = 64 * 1024 * 1024


class RpcError(RuntimeError):
    pass


# ------------------------------------------------------------- framing

def _send_frame(sock: socket.socket, obj) -> None:
    data = json.dumps(obj).encode()
    if len(data) > _MAX_FRAME:
        raise RpcError(f"frame too large: {len(data)} bytes")
    sock.sendall(len(data).to_bytes(4, "little") + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        got = sock.recv(n - len(buf))
        if not got:
            return None  # clean EOF
        buf += got
    return buf


def _recv_frame(sock: socket.socket):
    head = _recv_exact(sock, 4)
    if head is None:
        return None
    n = int.from_bytes(head, "little")
    if n > _MAX_FRAME:
        raise RpcError(f"frame too large: {n} bytes")
    body = _recv_exact(sock, n)
    if body is None:
        raise RpcError("connection closed mid-frame")
    return json.loads(body)


# ------------------------------------------------------------- backend

class RpcBackend:
    """Verb implementations over ``base/<database>/<table>`` roots.

    Reuses the REST layer's ``TableService`` per database, so RPC and
    HTTP share one behavior (locks, validation, error mapping)."""

    def __init__(self, base: str):
        self.base = base
        self._svcs: dict[str, TableService] = {}

    def _svc(self, database: str) -> TableService:
        if not _NAME_RE.match(database):
            raise ServiceError(400, f"bad database name {database!r}")
        if database not in self._svcs:
            self._svcs[database] = TableService(f"{self.base}/{database}")
        return self._svcs[database]

    def _root(self, database: str, table: str) -> str:
        return self._svc(database)._root(table)

    # ------------------------------------------------------------ verbs
    def create_table(self, database: str, table: str,
                     schema: list | None = None,
                     table_config: dict | None = None) -> dict:
        out = self._svc(database).create_table(
            table, {"schema": schema} if schema else {})
        if table_config:
            from .table_config import set_table_config
            set_table_config(
                f"{self.base}/{database}/{table}",
                {k: v if isinstance(v, str) else json.dumps(v)
                 for k, v in table_config.items()})
        return {**out, "database": database}

    def drop_table(self, database: str, table: str) -> dict:
        return {**self._svc(database).drop_table(table),
                "database": database}

    def create_snapshot(self, database: str, table: str, lsn: int) -> dict:
        from .table_config import load_table_config
        root = self._root(database, table)
        snap = load(root)
        if snap.max_lsn < lsn:
            # the reference blocks until flush_lsn >= lsn; a batch
            # engine tells the caller to retry after its producer runs
            raise ServiceError(
                409, f"table at lsn {snap.max_lsn} < requested {lsn}; "
                     f"merge the pending CDC first")
        cfg = load_table_config(root).export
        synced = {}
        if cfg.iceberg_dest:
            from .iceberg import export_iceberg, sync_iceberg
            try:
                synced["iceberg"] = sync_iceberg(root, cfg.iceberg_dest)
            except FileNotFoundError:  # first snapshot: create the table
                synced["iceberg"] = export_iceberg(root, cfg.iceberg_dest)
        if cfg.delta_dest:
            from .export import export_delta, sync_delta
            try:
                synced["delta"] = sync_delta(root, cfg.delta_dest)
            except FileNotFoundError:
                synced["delta"] = export_delta(root, cfg.delta_dest)
        return {"database": database, "table": table,
                "version": snap.version, "max_lsn": snap.max_lsn,
                "synced": synced}

    def get_parquet_metadatas(self, data_files: list[str]) -> list[dict]:
        out = []
        for path in data_files:
            md = pq.ParquetFile(path).metadata
            out.append({
                "path": path,
                "num_rows": md.num_rows,
                "num_row_groups": md.num_row_groups,
                "serialized_size": md.serialized_size,
                "schema": [[md.schema.column(i).name,
                            str(md.schema.column(i).physical_type)]
                           for i in range(md.num_columns)],
                "row_groups": [
                    {"num_rows": md.row_group(g).num_rows,
                     "total_byte_size": md.row_group(g).total_byte_size}
                    for g in range(md.num_row_groups)],
            })
        return out

    def get_table_schema(self, database: str, table: str) -> dict:
        from .schema import table_schema
        snap = load(self._root(database, table))
        schema = table_schema(snap)
        buf = io.BytesIO()
        with pa.ipc.new_stream(buf, schema):
            pass  # schema-only IPC stream, the StreamWriter reply shape
        return {"arrow_ipc_base64": base64.b64encode(buf.getvalue()).decode()}

    def list_tables(self) -> list[dict]:
        from .table_config import load_table_config
        fs = for_root(self.base)
        out = []
        for db in sorted(fs.listdir("")) if fs.exists("") else []:
            if not fs.is_dir(db):
                continue
            for name in sorted(fs.listdir(db)):
                if not fs.exists(f"{db}/{name}/snapshots"):
                    continue
                root = f"{self.base}/{db}/{name}"
                snap = load(root)
                out.append({
                    "database": db, "table": name,
                    "cardinality": snap.total_rows,
                    # batch engine: a commit IS a flush (no WAL gap)
                    "commit_lsn": snap.max_lsn,
                    "flush_lsn": snap.max_lsn,
                    "iceberg_warehouse_location":
                        load_table_config(root).export.iceberg_dest,
                })
        return out

    def load_files(self, database: str, table: str,
                   files: list[str]) -> dict:
        return {**self._svc(database).upload(table, {"files": files}),
                "database": database}

    def optimize_table(self, database: str, table: str,
                       mode: str = "full") -> dict:
        """Reference mode vocabulary (``moonlink_backend/src/lib.rs:
        306-331``): ``data`` = victim-selected data compaction,
        ``index`` = index merge (→ our Z-order/Hilbert cluster, the
        SURVEY §2.5 M3 mapping), ``full`` = compact everything (→ the
        fused OPTIMIZE). ``incremental`` is accepted as the engine's
        own extension (victim-only fused pass)."""
        svc = self._svc(database)
        root = self._root(database, table)
        if mode in ("full", "incremental"):
            return {**svc.optimize(table, {"mode": mode}),
                    "database": database}
        if mode == "data":
            from .pipelines.compact import compact
            with svc._lock(table):
                snap = compact(root, mode="best_effort")
        elif mode == "index":
            from .pipelines.cluster import cluster
            with svc._lock(table):
                snap = cluster(root)
        else:
            raise ServiceError(
                400, f"Unrecognizable table optimization mode {mode!r}, "
                     f"expected one of 'data', 'index', 'full', "
                     f"'incremental'")
        version = (snap or load(root)).version
        return {"database": database, "table": table, "mode": mode,
                "version": version}

    def scan_table_begin(self, database: str, table: str,
                         lsn: int | None = None) -> tuple[dict, str]:
        """Returns (handoff manifest, pin token)."""
        from .sources.scan import scan_manifest
        root = self._root(database, table)
        try:
            state = (scan_manifest(root) if lsn is None
                     else scan_manifest(root, at_lsn=lsn))
        except ValueError as e:
            raise ServiceError(404, str(e))
        token = f"rpc-{uuid.uuid4().hex[:12]}"
        pin_snapshot(root, state["version"], token)
        return {**state, "pin_token": token}, token

    def scan_table_end(self, database: str, table: str,
                       token: str) -> dict:
        released = unpin_snapshot(self._root(database, table), token)
        return {"database": database, "table": table, "released": released}


# -------------------------------------------------------------- server

_VERBS = ("create_snapshot", "create_table", "drop_table",
          "get_parquet_metadatas", "get_table_schema", "list_tables",
          "load_files", "optimize_table", "scan_table_begin",
          "scan_table_end")


def _make_handler(backend: RpcBackend):
    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            # (database, table) -> pin token, freed on connection close —
            # the reference's per-connection read-state map
            # (rpc_server.rs:96, 168-180)
            pins: dict[tuple[str, str], str] = {}
            try:
                while True:
                    try:
                        req = _recv_frame(self.request)
                    except (RpcError, json.JSONDecodeError,
                            ConnectionError):
                        return
                    if req is None:
                        return
                    try:
                        result = self._dispatch(req, pins)
                        _send_frame(self.request, {"ok": True,
                                                   "result": result})
                    except ServiceError as e:
                        _send_frame(self.request,
                                    {"ok": False, "status": e.status,
                                     "error": str(e)})
                    except Exception as e:
                        _send_frame(self.request, {
                            "ok": False, "status": 500,
                            "error": f"{type(e).__name__}: {e}"})
            finally:
                for (db, tbl), token in pins.items():
                    try:
                        backend.scan_table_end(db, tbl, token)
                    except Exception:
                        pass  # table dropped while pinned

        def _dispatch(self, req: dict, pins: dict):
            op = req.get("op")
            if op not in _VERBS:
                raise ServiceError(400, f"unknown op {op!r}")
            params = {k: v for k, v in req.items() if k != "op"}
            if op == "scan_table_begin":
                key = (params.get("database", ""), params.get("table", ""))
                if key in pins:
                    # the reference asserts map.insert is None
                    raise ServiceError(
                        409, f"scan already open for {key}; "
                             f"scan_table_end it first")
                state, token = backend.scan_table_begin(**params)
                pins[key] = token
                return state
            if op == "scan_table_end":
                key = (params.get("database", ""), params.get("table", ""))
                token = pins.pop(key, None)
                if token is None:
                    raise ServiceError(409, f"no open scan for {key}")
                return backend.scan_table_end(*key, token)
            return getattr(backend, op)(**params)

    return Handler


class RpcServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def make_server(base: str, port: int = 0,
                host: str = "127.0.0.1") -> RpcServer:
    """Bind (port 0 = ephemeral); caller runs serve_forever/shutdown."""
    return RpcServer((host, port), _make_handler(RpcBackend(base)))


# -------------------------------------------------------------- client

class RpcClient:
    """Minimal blocking client; one outstanding request at a time
    (the reference's client helpers are the same shape, lib.rs:18-23)."""

    def __init__(self, host: str, port: int, timeout: float = 600.0):
        # generous default: data verbs (load_files, optimize_table)
        # launch Ray Data jobs server-side, and the server's FIRST such
        # verb also pays Ray's local init (~10 s cold)
        self.sock = socket.create_connection((host, port), timeout=timeout)

    def call(self, op: str, **params):
        _send_frame(self.sock, {"op": op, **params})
        resp = _recv_frame(self.sock)
        if resp is None:
            raise RpcError("server closed the connection")
        if not resp.get("ok"):
            raise RpcError(f"[{resp.get('status')}] {resp.get('error')}")
        return resp.get("result")

    def get_table_schema(self, database: str, table: str) -> pa.Schema:
        out = self.call("get_table_schema", database=database, table=table)
        blob = base64.b64decode(out["arrow_ipc_base64"])
        with pa.ipc.open_stream(blob) as rd:
            return rd.schema

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser(description="moonlink_ray RPC server")
    ap.add_argument("--base", required=True,
                    help="warehouse dir: tables live at base/<db>/<table>")
    ap.add_argument("--port", type=int, default=8640)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()
    srv = make_server(args.base, args.port, args.host)
    print(json.dumps({"serving": f"tcp://{args.host}:"
                                 f"{srv.server_address[1]}",
                      "base": args.base}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()


if __name__ == "__main__":
    main()
