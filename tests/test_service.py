"""HTTP serving surface (service.py) — the REST analog of moonlink's
service layer (/root/reference/src/moonlink_service/src/rest_api.rs:
196-210: health/list/create/drop/ingest/upload/optimize) plus the
scan_table_begin read handoff (moonlink_rpc/src/lib.rs:13-38) as
GET /tables/{t}/manifest. Round-trip: create over HTTP, post rows,
upsert/delete, fetch the manifest handoff and verify the final state
with DuckDB alone."""

import base64
import json
import threading
import urllib.request

import duckdb
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.schema import schema_to_list
from moonlink_ray.service import make_server


@pytest.fixture()
def server(tmp_path):
    srv = make_server(str(tmp_path / "base"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _req(url, method="GET", body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type":
                                          "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _row(i, caption=None):
    r = synth.build_rows([i]).to_pylist()[0]
    r["bytes"] = base64.b64encode(r["bytes"]).decode()
    if caption is not None:
        r["caption"] = caption
    return r


@pytest.mark.usefixtures("ray_session")
def test_rest_round_trip_duckdb_verified(server, tmp_path):
    # create with the images schema
    st, out = _req(f"{server}/tables/t1", "POST", {
        "schema": [{"name": n, "data_type": t}
                   for n, t in schema_to_list(synth.IMAGES_SCHEMA)]})
    assert st == 200, out

    # insert three rows, then upsert one and delete another
    st, out = _req(f"{server}/ingest/t1", "POST", {
        "operation": "insert", "data": [_row(0), _row(1), _row(2)]})
    assert st == 200 and out["rows"] == 3
    st, out = _req(f"{server}/ingest/t1", "POST", {
        "operation": "upsert", "data": _row(1, caption="rewritten")})
    assert st == 200
    st, out = _req(f"{server}/ingest/t1", "POST", {
        "operation": "delete", "data": {"image_id": synth.image_id(2)}})
    assert st == 200

    st, status = _req(f"{server}/tables/t1/status")
    assert st == 200 and status["rows"] == 2

    # the read handoff, consumed by DuckDB alone (scan_table_begin analog)
    st, manifest = _req(f"{server}/tables/t1/manifest")
    assert st == 200
    con = duckdb.connect()
    parts = []
    for f in manifest["fragments"]:
        span = f.get("row_span")
        lo = span[0] if span else 0
        q = (f"SELECT image_id, caption FROM read_parquet('{f['path']}', "
             f"file_row_number=true) WHERE 1=1")
        if span:
            q += (f" AND file_row_number >= {span[0]}"
                  f" AND file_row_number < {span[1]}")
        if f["dv_path"]:
            q += (f" AND file_row_number - {lo} NOT IN "
                  f"(SELECT pos FROM read_parquet('{f['dv_path']}'))")
        parts.append(q)
    got = con.execute(" UNION ALL ".join(parts) +
                      " ORDER BY image_id").fetchall()
    assert [r[0] for r in got] == [synth.image_id(0), synth.image_id(1)]
    assert got[1][1] == "rewritten"

    # list shows the table with its live row count
    st, listing = _req(f"{server}/tables")
    assert [t["table"] for t in listing["tables"]] == ["t1"]
    assert listing["tables"][0]["rows"] == 2


@pytest.mark.usefixtures("ray_session")
def test_rest_upload_and_optimize(server, tmp_path):
    st, _ = _req(f"{server}/tables/t2", "POST", {})
    assert st == 200
    p = str(tmp_path / "bulk.parquet")
    pq.write_table(synth.build_rows(list(range(20))), p)
    st, out = _req(f"{server}/upload/t2", "POST", {"files": [p]})
    assert st == 200 and out["files"] == 1
    st, out = _req(f"{server}/tables/t2/optimize", "POST", {"mode": "full"})
    assert st == 200
    st, status = _req(f"{server}/tables/t2/status")
    assert status["rows"] == 20


@pytest.mark.usefixtures("ray_session")
def test_rest_error_mapping(server):
    st, out = _req(f"{server}/health")
    assert st == 200 and out["status"] == "healthy"
    st, _ = _req(f"{server}/tables/none/status")
    assert st == 404
    st, _ = _req(f"{server}/tables/t3", "POST", {})
    assert st == 200
    st, _ = _req(f"{server}/tables/t3", "POST", {})
    assert st == 409                               # duplicate create
    st, out = _req(f"{server}/ingest/t3", "POST",
                   {"operation": "upscale", "data": {"image_id": "x"}})
    assert st == 400 and "Invalid operation" in out["error"]
    st, out = _req(f"{server}/ingest/t3", "POST", {
        "operation": "insert",
        "data": {"image_id": "x", "bytes": "!!!not-base64"}})
    assert st in (400, 500) and "base64" in out["error"]
    st, _ = _req(f"{server}/tables/t3", "DELETE")
    assert st == 200
    st, _ = _req(f"{server}/tables/t3/status")
    assert st == 404
