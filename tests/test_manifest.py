import os

import numpy as np
import pytest

from moonlink_ray import synth
from moonlink_ray.fragments import read_dv, read_fragment, write_dv, write_fragment
from moonlink_ray.manifest import (CommitConflict, commit, current_version,
                                   init_table, list_versions, load,
                                   read_lineage, write_lineage)


def test_init_commit_reload(tmp_path):
    root = str(tmp_path / "t")
    init_table(root)
    assert current_version(root) == 0
    t = synth.build_rows(range(10))
    m = write_fragment(root, t, "frag-a")
    snap = commit(root, [m], max_lsn=5, job={"kind": "test"}, expected_parent=0)
    assert snap.version == 1
    re = load(root)
    assert re.max_lsn == 5
    assert re.fragments[0].rows == 10
    assert re.fragments[0].stats["image_id"] == ["img-000000000000", "img-000000000009"]
    assert list_versions(root) == [0, 1]


def test_commit_conflict(tmp_path):
    root = str(tmp_path / "t")
    init_table(root)
    commit(root, [], max_lsn=0, job={}, expected_parent=0)
    with pytest.raises(CommitConflict):
        commit(root, [], max_lsn=0, job={}, expected_parent=0)


def test_concurrent_commit_exactly_one_wins(tmp_path, monkeypatch):
    """Conditional-put commit (file_catalog.rs:259-280 analog): two
    committers that BOTH read the same parent before either writes —
    the TOCTOU window of read-version-then-publish — race the exclusive
    snapshot create; exactly one wins, the loser gets CommitConflict
    (not a silent clobber)."""
    from moonlink_ray import manifest as M

    root = str(tmp_path / "t")
    init_table(root)
    # pin the version read both committers make, simulating concurrency
    monkeypatch.setattr(M, "current_version", lambda r: 0)
    snap1 = M.commit(root, [], max_lsn=1, job={"kind": "w1"})
    assert snap1.version == 1
    with pytest.raises(CommitConflict):
        M.commit(root, [], max_lsn=2, job={"kind": "w2"})
    monkeypatch.undo()
    # the winner's snapshot survives untouched
    assert load(root).job["kind"] == "w1"
    assert load(root).max_lsn == 1


def test_create_exclusive_single_winner_under_threads(tmp_path):
    """The primitive itself: N threads race one key; exactly one wins."""
    import threading

    from moonlink_ray.fs import for_root

    root = str(tmp_path / "t")
    init_table(root)
    fs = for_root(root)
    results = []
    barrier = threading.Barrier(8)

    def racer(i):
        barrier.wait()
        results.append((i, fs.create_exclusive("snapshots/v9.json",
                                               f"writer-{i}")))

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    winners = [i for i, ok in results if ok]
    assert len(winners) == 1
    assert fs.read_text("snapshots/v9.json") == f"writer-{winners[0]}"


def test_version_hint_self_heals(tmp_path):
    """A committer that dies between snapshot create and hint swap (or
    a late hint write) leaves the hint trailing; current_version probes
    forward over existing snapshot files (the Iceberg file-catalog
    listing fallback)."""
    from moonlink_ray.fs import for_root

    root = str(tmp_path / "t")
    init_table(root)
    snap = commit(root, [], max_lsn=3, job={"kind": "ok"})
    assert snap.version == 1
    # simulate the stale hint
    for_root(root).write_text_atomic("version-hint.text", "0")
    assert current_version(root) == 1
    assert load(root).max_lsn == 3


def test_fragment_dv_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    init_table(root)
    t = synth.build_rows(range(20))
    m = write_fragment(root, t, "frag-a")
    dv = write_dv(root, "dv-1", np.array([0, 5, 5, 19]))
    assert dv["count"] == 3
    assert list(read_dv(root, dv)) == [0, 5, 19]
    m.dv = dv
    live = read_fragment(root, m)
    assert live.num_rows == 17
    ids = live["image_id"].to_pylist()
    assert "img-000000000000" not in ids and "img-000000000005" not in ids
    with_pos = read_fragment(root, m, columns=["image_id"], with_pos=True)
    assert with_pos["_pos"].to_pylist()[0] == 1
    assert m.live_rows == 17


def test_lineage_sidecars(tmp_path):
    root = str(tmp_path / "t")
    init_table(root)
    write_lineage(root, "run1", "part-0", {"rows": 3})
    write_lineage(root, "run1", "part-1", {"rows": 4})
    got = read_lineage(root, "run1")
    assert got == {"part-0": {"rows": 3}, "part-1": {"rows": 4}}
    assert read_lineage(root, "nope") == {}


def test_snapshot_isolation_files_immutable(tmp_path):
    root = str(tmp_path / "t")
    init_table(root)
    t = synth.build_rows(range(5))
    m1 = write_fragment(root, t, "frag-a")
    s1 = commit(root, [m1], max_lsn=1, job={}, expected_parent=0)
    before = read_fragment(root, m1)
    m2 = write_fragment(root, synth.build_rows(range(5, 9)), "frag-b")
    commit(root, [m2], max_lsn=2, job={}, expected_parent=1)
    # reader pinned at v1 still sees identical bytes
    again = load(root, s1.version)
    assert [f.fragment_id for f in again.fragments] == ["frag-a"]
    assert read_fragment(root, again.fragments[0]).equals(before)


class TestVersionAtLsn:
    """scan_table(lsn) analog: resolve snapshots by replication LSN."""

    @pytest.mark.usefixtures("ray_session")
    def test_resolution_rules(self, tmp_path):
        from moonlink_ray.bootstrap import (bootstrap_images_table,
                                            write_cdc_parquet)
        from moonlink_ray.manifest import load, version_at_lsn
        from moonlink_ray.pipelines.merge import merge
        from moonlink_ray.pipelines.optimize import optimize
        from moonlink_ray.sources.scan import scan

        root = str(tmp_path / "t")
        bootstrap_images_table(root, 80, rows_per_fragment=32)  # v1, lsn 0
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=80, n_ops=20)  # lsns 1000..1019
        merge(root, cdc)            # v2, max_lsn 1019
        optimize(root)              # v3, same max_lsn, better layout

        assert version_at_lsn(root, 0) == 1
        assert version_at_lsn(root, 999) == 1
        # maintenance does not advance LSN: newest layout wins
        assert version_at_lsn(root, 1019) == 3
        assert version_at_lsn(root, 10**9) == 3
        assert version_at_lsn(root, -1) == 0  # empty init snapshot
        with pytest.raises(ValueError):
            version_at_lsn(root, -2)
        # scan(at_lsn) sees the pre-merge content
        assert scan(root, at_lsn=500).count() == 80
        assert scan(root, at_lsn=2000).count() == load(root).total_rows
