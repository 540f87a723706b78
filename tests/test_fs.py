"""Pluggable filesystem layer (fs.py): mock object-store table
lifecycle, chaos fault injection + retry-to-completion equivalence.

Moonlink analogs: filesystem accessor trait with local/S3/GCS backends
(`/root/reference/src/moonlink/src/storage/filesystem/accessor/`) and
the chaos wrapper used by its storage tests.
"""

import numpy as np
import pytest

from moonlink_ray import synth
from moonlink_ray.fragments import read_fragment, write_fragment
from moonlink_ray.fs import TableFS, for_root
from moonlink_ray.manifest import commit, init_table, list_versions, load


def test_tablefs_local_roundtrip(tmp_path):
    fs = for_root(str(tmp_path / "t"))
    fs.makedirs("a/b")
    fs.write_text_atomic("a/b/x.txt", "hello")
    assert fs.read_text("a/b/x.txt") == "hello"
    assert fs.listdir("a") == ["b"]
    assert fs.listdir("missing") == []
    assert fs.exists("a/b/x.txt") and not fs.exists("a/b/y.txt")
    assert fs.delete("a/b/x.txt") and not fs.delete("a/b/x.txt")


def test_mock_object_store_table_lifecycle():
    """Full driver-side table lifecycle on the in-memory object-store
    backend: init -> fragment write -> commit -> load -> read; proves
    every durable-state op routes through the fs seam (no os.path)."""
    root = "mock://lifecycle/tbl"
    init_table(root)
    t = synth.build_rows(list(range(12)))
    m = write_fragment(root, t, "frag-x-00000-000", max_lsn=5)
    assert m.rows == 12 and m.size_bytes > 0 and "image_id" in m.stats
    snap = commit(root, [m], max_lsn=5, job={"kind": "test"},
                  expected_parent=0)
    assert snap.version == 1
    again = load(root)
    assert again.total_rows == 12
    back = read_fragment(root, again.fragments[0])
    assert back.equals(t)
    assert list_versions(root) == [0, 1]


def test_chaos_fs_injects_and_is_deterministic(tmp_path):
    inner = str(tmp_path / "t")
    chaos_root = f"chaos://400/99/{inner}"
    for_root(inner).makedirs("")  # root dir must exist for local writes
    fs = TableFS.for_root(chaos_root)
    outcomes = []
    for i in range(30):
        try:
            fs.write_text_atomic("x.txt", str(i))
            outcomes.append(True)
        except OSError:
            outcomes.append(False)
    assert any(outcomes) and not all(outcomes)
    fs2 = TableFS.for_root(chaos_root)
    outcomes2 = []
    for i in range(30):
        try:
            fs2.write_text_atomic("y.txt", str(i))
            outcomes2.append(True)
        except OSError:
            outcomes2.append(False)
    assert outcomes == outcomes2  # same seed -> same failure schedule


@pytest.mark.usefixtures("ray_session")
def test_chaos_merge_retries_to_identical_manifest(tmp_path):
    """MERGE against a chaos-wrapped root: injected storage failures may
    abort attempts, but retrying with the SAME run_id converges to a
    manifest identical to the failure-free run (idempotent fragment
    names + lineage checkpoints)."""
    import pyarrow.parquet as pq

    from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
    from moonlink_ray.pipelines.merge import merge
    from moonlink_ray.sources.scan import scan_arrow

    clean = str(tmp_path / "clean")
    chaotic_inner = str(tmp_path / "chaotic")
    bootstrap_images_table(clean, 80, rows_per_fragment=16)
    bootstrap_images_table(chaotic_inner, 80, rows_per_fragment=16)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=80, n_ops=40)

    merge(clean, cdc, run_id="chaosrun", num_buckets=4)
    want = scan_arrow(clean, sort_by="image_id")

    chaos_root = f"chaos://120/7/{chaotic_inner}"
    attempts = 0
    while True:
        attempts += 1
        assert attempts < 50
        try:
            merge(chaos_root, cdc, run_id="chaosrun", num_buckets=4)
            break
        except OSError:
            continue
    got = scan_arrow(chaotic_inner, sort_by="image_id")
    assert got.equals(want)


def test_arrival_time_sees_hardlink_adoption(tmp_path):
    """A hardlink-adopted file keeps the source's old mtime but its
    ctime bumps at link time — arrival_time must report the link time,
    or vacuum orphan-grace checks would sweep a just-adopted
    uncommitted export file as 'old' (the mid-sync corruption the
    grace exists to prevent)."""
    import os
    import time

    from moonlink_ray.fs import for_root
    src = tmp_path / "src.parquet"
    src.write_bytes(b"x" * 128)
    old = time.time() - 7200
    os.utime(src, (old, old))                    # hours-old mtime
    dest = tmp_path / "dest"
    dest.mkdir()
    fs = for_root(str(dest))
    fs.adopt_file(str(src), "part-x.parquet")
    assert fs.mtime("part-x.parquet") < time.time() - 3600  # mtime old
    at = fs.arrival_time("part-x.parquet")
    assert at is not None and time.time() - at < 60  # ctime fresh
