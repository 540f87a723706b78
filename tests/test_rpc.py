"""Socket RPC surface (rpc.py) — the moonlink_rpc analog
(/root/reference/src/moonlink_rpc/src/lib.rs:27-38 verbs served by
moonlink_service/src/rpc_server.rs:93-186). Round-trip over a real TCP
socket: create → load_files → list/schema/metadata → pinned scan
handoff verified with DuckDB → pin semantics against expire →
create_snapshot syncing the configured Iceberg export."""

import json
import threading
import time

import duckdb
import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.rpc import RpcClient, RpcError, make_server
from moonlink_ray.schema import schema_to_list


@pytest.fixture()
def rpc(tmp_path):
    srv = make_server(str(tmp_path / "wh"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host, port = srv.server_address
    yield host, port, str(tmp_path / "wh")
    srv.shutdown()


def _schema_body():
    return [{"name": n, "data_type": t}
            for n, t in schema_to_list(synth.IMAGES_SCHEMA)]


def _load_fixture(client, tmp_path, n=20):
    src = str(tmp_path / "load.parquet")
    pq.write_table(synth.build_rows(list(range(n))), src)
    client.call("create_table", database="main", table="t1",
                schema=_schema_body())
    out = client.call("load_files", database="main", table="t1",
                      files=[src])
    return src, out


@pytest.mark.usefixtures("ray_session")
def test_rpc_round_trip_pinned_scan(rpc, tmp_path):
    host, port, base = rpc
    with RpcClient(host, port) as client:
        src, loaded = _load_fixture(client, tmp_path)
        assert loaded["files"] == 1

        tables = client.call("list_tables")
        assert [(t["database"], t["table"], t["cardinality"])
                for t in tables] == [("main", "t1", 20)]
        assert tables[0]["commit_lsn"] == tables[0]["flush_lsn"]

        # Arrow IPC schema bytes, byte-compatible with the reference's
        # StreamWriter reply (rpc_server.rs:139-143)
        assert client.get_table_schema("main", "t1") == synth.IMAGES_SCHEMA

        md = client.call("get_parquet_metadatas", data_files=[src])
        assert md[0]["num_rows"] == 20 and md[0]["num_row_groups"] >= 1

        # optimize rewrites the table into fragments/ under the root
        opt = client.call("optimize_table", database="main", table="t1",
                          mode="full")
        v_opt = opt["version"]

        # pinned scan: the handoff is DuckDB-readable without this
        # package, and the pin survives a concurrent rewrite + expire
        state = client.call("scan_table_begin", database="main",
                            table="t1")
        assert state["version"] == v_opt
        files = [f["path"] for f in state["fragments"]]
        got = duckdb.sql(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        assert got == 20

        client.call("optimize_table", database="main", table="t1",
                    mode="full")  # v_opt's files become unreferenced
        from moonlink_ray.pipelines.expire import expire
        root = f"{base}/main/t1"
        rep = expire(root, keep_last=1)
        assert v_opt in rep["pinned_versions"]
        assert v_opt in rep["retained_versions"]
        # every handed-off file is still readable mid-pin
        again = duckdb.sql(
            f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
        assert again == 20

        client.call("scan_table_end", database="main", table="t1")
        rep2 = expire(root, keep_last=1)
        assert v_opt in rep2["expired_versions"]
        import os
        assert not any(os.path.exists(p) for p in files
                       if f"{os.sep}fragments{os.sep}" in p)


def test_rpc_pin_released_on_connection_close(rpc, tmp_path):
    host, port, base = rpc
    client = RpcClient(host, port)
    client.call("create_table", database="main", table="t2",
                schema=_schema_body())
    client.call("scan_table_begin", database="main", table="t2")
    import os
    pins = f"{base}/main/t2/pins"
    assert os.listdir(pins)
    client.close()  # no scan_table_end: the server frees the pin
    deadline = time.time() + 5
    while os.listdir(pins) and time.time() < deadline:
        time.sleep(0.05)
    assert not os.listdir(pins)


@pytest.mark.usefixtures("ray_session")
def test_rpc_create_snapshot_syncs_iceberg(rpc, tmp_path):
    host, port, base = rpc
    dest = str(tmp_path / "ice")
    with RpcClient(host, port) as client:
        src = str(tmp_path / "load.parquet")
        pq.write_table(synth.build_rows(list(range(8))), src)
        client.call("create_table", database="main", table="t3",
                    schema=_schema_body(),
                    table_config={"export.iceberg_dest": dest})
        client.call("load_files", database="main", table="t3",
                    files=[src])

        # ahead of the committed LSN: the reference blocks, we 409
        with pytest.raises(RpcError, match="409"):
            client.call("create_snapshot", database="main", table="t3",
                        lsn=999)

        out = client.call("create_snapshot", database="main", table="t3",
                          lsn=0)
        assert "iceberg" in out["synced"]
        from moonlink_ray.iceberg import iceberg_active_files
        active = iceberg_active_files(dest)
        assert len(active) >= 1
        got = duckdb.sql(f"SELECT count(*) FROM read_parquet({active!r})"
                         ).fetchone()[0]
        assert got == 8
        assert client.call("list_tables")[0][
            "iceberg_warehouse_location"] == dest


def test_rpc_errors_keep_connection_alive(rpc):
    host, port, _ = rpc
    with RpcClient(host, port) as client:
        with pytest.raises(RpcError, match="unknown op"):
            client.call("bogus_verb")
        with pytest.raises(RpcError, match="404"):
            client.call("get_table_schema", database="main", table="nope")
        client.call("create_table", database="main", table="t4",
                    schema=_schema_body())
        client.call("scan_table_begin", database="main", table="t4")
        with pytest.raises(RpcError, match="409"):  # rpc_server.rs:180
            client.call("scan_table_begin", database="main", table="t4")
        with pytest.raises(RpcError, match="409"):
            client.call("scan_table_end", database="main", table="nope")
        # the connection survived every error above
        assert client.call("list_tables")[0]["table"] == "t4"


@pytest.mark.usefixtures("ray_session")
def test_rpc_optimize_reference_modes(rpc, tmp_path):
    # moonlink_backend/src/lib.rs:306-331: data | index | full
    host, port, _ = rpc
    with RpcClient(host, port) as client:
        _load_fixture(client, tmp_path, n=8)
        v0 = client.call("list_tables")[0]
        out = client.call("optimize_table", database="main", table="t1",
                          mode="data")
        assert out["version"] >= 1
        out = client.call("optimize_table", database="main", table="t1",
                          mode="index")
        assert out["mode"] == "index" and out["version"] >= 1
        with pytest.raises(RpcError, match="Unrecognizable"):
            client.call("optimize_table", database="main", table="t1",
                        mode="bogus")
        assert client.call("list_tables")[0]["cardinality"] == \
            v0["cardinality"]
