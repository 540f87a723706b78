"""Warm-page scratch pool: recycling correctness and safety rails.

The pool overwrites retired scratch files IN PLACE; the failure mode
that must never happen is a reader seeing stale bytes — either a
recycled file's old tail after a smaller write (footer-not-at-EOF
corruption) or an overwrite reaching a file someone else still links
(bench fixtures are hardlink clones). These tests pin both rails plus
the claim/retire protocol itself.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from moonlink_ray import pagepool


@pytest.fixture()
def pool_env(tmp_path, monkeypatch):
    """Isolated pool rooted inside tmp_path (same device as the data
    files the tests write there)."""
    base = tmp_path / "poolbase"
    base.mkdir()
    monkeypatch.setenv("MLRAY_POOL_BASES", str(base))
    monkeypatch.setenv("MLRAY_PAGE_POOL", "1")
    monkeypatch.setenv("MLRAY_POOL_CAP_GB", "1")
    return tmp_path


def _mk_file(path, mb=2, byte=b"\xee"):
    with open(path, "wb") as f:
        f.write(byte * (mb << 20))
    return str(path)


def test_retire_then_acquire_roundtrip(pool_env):
    p = _mk_file(pool_env / "dead.bin", mb=2)
    assert pagepool.retire(p) == "pooled"
    assert not os.path.exists(p)
    got = pagepool.acquire(str(pool_env / "anything"), size_hint=1 << 20)
    assert got is not None and os.path.getsize(got) == 2 << 20
    # claimed file is out of the pool: a second acquire finds nothing
    assert pagepool.acquire(str(pool_env / "x")) is None
    pagepool.release(got)
    assert pagepool.acquire(str(pool_env / "x")) is not None


def test_retire_never_pools_hardlinked_files(pool_env):
    """The bench clones fixtures with os.link; pooling (then
    overwriting) a file with nlink>1 would corrupt the master copy."""
    master = _mk_file(pool_env / "master.bin", mb=2)
    clone = str(pool_env / "clone.bin")
    os.link(master, clone)
    assert pagepool.retire(clone) == "deleted"
    assert pagepool.acquire(str(pool_env / "x")) is None  # nothing pooled
    with open(master, "rb") as f:  # master intact
        assert f.read(4) == b"\xee\xee\xee\xee"


def test_retire_skips_tiny_files(pool_env):
    p = _mk_file(pool_env / "tiny.bin", mb=0)
    open(p, "wb").write(b"x" * 100)
    assert pagepool.retire(p) == "deleted"


def test_pooled_write_parquet_truncates_stale_tail(pool_env):
    """Write a SMALL table through a recycled LARGE file: the reader
    must see exactly the new parquet bytes (footer at EOF)."""
    pagepool.retire(_mk_file(pool_env / "big.bin", mb=4))
    t = pa.table({"a": list(range(100)), "b": [b"y" * 50] * 100})
    dest = str(pool_env / "out.parquet")
    recycled = pagepool.pooled_write_parquet(t, dest, compression="NONE")
    assert recycled
    assert os.path.getsize(dest) < 1 << 20
    assert pq.read_table(dest).equals(t)


def test_pooled_write_falls_back_when_pool_empty(pool_env):
    t = pa.table({"a": [1, 2, 3]})
    dest = str(pool_env / "out2.parquet")
    assert pagepool.pooled_write_parquet(t, dest) is False
    assert pq.read_table(dest).equals(t)
    # no temp debris left beside the destination
    assert [n for n in os.listdir(pool_env) if ".tmp-" in n] == []


def test_pooled_sink_streaming_row_groups(pool_env):
    """The cluster spill writer's shape: ParquetWriter over a recycled
    file, one row group per bucket, read back by row group."""
    pagepool.retire(_mk_file(pool_env / "big.bin", mb=4))
    t = pa.table({"zb": list(range(400)), "v": [b"z" * 40] * 400})
    dest = str(pool_env / "spill.parquet")
    sink = pagepool.PooledSink(dest, size_hint=t.nbytes)
    assert sink.recycled
    w = pq.ParquetWriter(sink, t.schema, compression="NONE")
    for i in range(4):
        w.write_table(t.slice(i * 100, 100), row_group_size=100)
    w.close()
    sink.commit()
    pf = pq.ParquetFile(dest)
    assert pf.num_row_groups == 4
    got = pa.concat_tables(pf.read_row_group(i) for i in range(4))
    assert got.equals(t)


def test_sink_abort_returns_file_to_pool(pool_env):
    pagepool.retire(_mk_file(pool_env / "big.bin", mb=2))
    dest = str(pool_env / "never.parquet")
    sink = pagepool.PooledSink(dest, size_hint=1)
    sink.write(b"partial")
    sink.abort()
    assert not os.path.exists(dest)
    assert pagepool.acquire(str(pool_env / "x")) is not None  # returned


def test_acquire_prefers_smallest_fit(pool_env):
    pagepool.retire(_mk_file(pool_env / "a.bin", mb=2))
    pagepool.retire(_mk_file(pool_env / "b.bin", mb=8))
    got = pagepool.acquire(str(pool_env / "x"), size_hint=1 << 20)
    assert os.path.getsize(got) == 2 << 20  # not the 8 MB one


def test_cap_degrades_to_delete(pool_env, monkeypatch):
    monkeypatch.setenv("MLRAY_POOL_CAP_GB", "0.003")  # ~3 MB
    assert pagepool.retire(_mk_file(pool_env / "a.bin", mb=2)) == "pooled"
    assert pagepool.retire(_mk_file(pool_env / "b.bin", mb=2)) == "deleted"


def test_disabled_by_env(pool_env, monkeypatch):
    monkeypatch.setenv("MLRAY_PAGE_POOL", "0")
    assert pagepool.retire(_mk_file(pool_env / "a.bin", mb=2)) == "deleted"
    assert pagepool.acquire(str(pool_env / "x")) is None


def test_retire_tree_mixes_pool_and_delete(pool_env):
    d = pool_env / "tree"
    (d / "sub").mkdir(parents=True)
    _mk_file(d / "big.bin", mb=2)
    open(d / "sub" / "small.txt", "w").write("hi")
    counts = pagepool.retire_tree(str(d))
    assert not d.exists()
    assert counts["pooled"] == 1 and counts["deleted"] == 1


def test_scavenge_reclaims_dead_pid_orphans(pool_env):
    pagepool.retire(_mk_file(pool_env / "a.bin", mb=2))
    claimed = pagepool.acquire(str(pool_env / "x"))
    # simulate a crashed process: rename the claim to a dead pid
    pool = os.path.dirname(claimed)
    orphan = os.path.join(pool, "inuse-999999999-deadbeef")
    os.rename(claimed, orphan)
    got = pagepool.acquire(str(pool_env / "x"))
    assert got is not None  # scavenged back and re-claimed


def test_tablefs_write_parquet_atomic_uses_pool(pool_env):
    """End-to-end through the TableFS seam fragments are written with."""
    from moonlink_ray.fs import TableFS
    root = pool_env / "tbl"
    root.mkdir()
    fs = TableFS.for_root(str(root))
    pagepool.retire(_mk_file(pool_env / "dead.bin", mb=4))
    t = pa.table({"image_id": ["a", "b"], "w": [1, 2]})
    fs.write_parquet_atomic(t, "frag.parquet", compression="NONE")
    assert pq.read_table(str(root / "frag.parquet")).equals(t)
    # the pooled file was consumed into the destination
    assert pagepool.acquire(str(pool_env / "x")) is None


def test_fill_parallel_tops_up_to_target(pool_env, monkeypatch):
    monkeypatch.setenv("MLRAY_POOL_CAP_GB", "0.05")  # ~51 MB
    added = pagepool.fill(str(pool_env / "near"), target_gb=0.03,
                          budget_s=30.0, file_mb=8, workers=3)
    assert added > 0
    st = pagepool.stats(str(pool_env / "near"))
    assert st["bytes"] >= 0.03 * (1 << 30)
    # already at target: second fill is a no-op
    assert pagepool.fill(str(pool_env / "near"), target_gb=0.03,
                         budget_s=30.0, file_mb=8, workers=3) == 0.0
    # a target beyond the cap fills only to the cap
    assert pagepool.fill(str(pool_env / "near"), target_gb=50,
                         budget_s=30.0, file_mb=8, workers=2) <= 0.06
