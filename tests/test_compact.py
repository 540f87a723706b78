"""Compaction scenarios (mirrors /root/reference/src/moonlink/src/storage/
compaction/tests.rs: single/multi file, all-rows-deleted, row accounting)."""

import numpy as np
import pytest

from moonlink_ray import codec, synth
from moonlink_ray.fragments import write_dv
from moonlink_ray.manifest import commit, load
from moonlink_ray.pipelines.compact import (CompactionConfig, compact,
                                            plan_groups, select_victims)
from moonlink_ray.sources.scan import scan_arrow

CFG = CompactionConfig(min_victims=2, small_file_bytes=32 * 1024 * 1024,
                       output_target_bytes=2 * 1024 * 1024)


@pytest.mark.usefixtures("ray_session")
class TestCompact:
    def test_row_accounting_and_content(self, tmp_table):
        before = scan_arrow(tmp_table, sort_by="image_id")
        n_before = load(tmp_table).version
        snap = compact(tmp_table, cfg=CFG)
        assert snap is not None and snap.version == n_before + 1
        # fewer fragments, identical live rows
        assert len(snap.fragments) < len(load(tmp_table, 1).fragments)
        after = scan_arrow(tmp_table, sort_by="image_id")
        assert after.num_rows == before.num_rows
        assert after["image_id"].to_pylist() == before["image_id"].to_pylist()
        assert after["caption"].to_pylist() == before["caption"].to_pylist()
        # re-encode is byte-stable (quantization fixed point + fixed zlib)
        assert after["bytes"].to_pylist() == before["bytes"].to_pylist()

    def test_psnr_invariant_on_reencode(self, tmp_table):
        before = {r["image_id"]: r["bytes"]
                  for r in scan_arrow(tmp_table).to_pylist()}
        compact(tmp_table, cfg=CFG)
        for row in scan_arrow(tmp_table).to_pylist():
            a = codec.decode(before[row["image_id"]])
            b = codec.decode(row["bytes"])
            if row["fmt"] == "png":
                assert np.array_equal(a, b)
            else:
                assert codec.psnr(a, b) >= 40.0

    def test_deleted_rows_dropped(self, tmp_table):
        snap = load(tmp_table)
        # kill rows 0..9 of the first fragment via a DV
        f0 = snap.fragments[0]
        f0.dv = write_dv(tmp_table, "dv-test", np.arange(10))
        commit(tmp_table, snap.fragments, max_lsn=snap.max_lsn,
               job={"kind": "test-dv"}, expected_parent=snap.version)
        before = scan_arrow(tmp_table, sort_by="image_id")
        snap2 = compact(tmp_table, cfg=CFG)
        after = scan_arrow(tmp_table, sort_by="image_id")
        assert after.num_rows == before.num_rows == 190
        assert after["image_id"].to_pylist() == before["image_id"].to_pylist()
        assert all(f.dv is None for f in snap2.fragments)

    def test_all_rows_deleted_fragment_emits_nothing(self, tmp_table):
        snap = load(tmp_table)
        f0 = snap.fragments[0]
        f0.dv = write_dv(tmp_table, "dv-all", np.arange(f0.rows))
        commit(tmp_table, snap.fragments, max_lsn=snap.max_lsn,
               job={"kind": "test-dv"}, expected_parent=snap.version)
        snap2 = compact(tmp_table, mode="full", cfg=CFG)
        assert snap2 is not None
        assert scan_arrow(tmp_table).num_rows == 200 - f0.rows

    def test_victim_selection_policy(self, tmp_table):
        snap = load(tmp_table)
        cfg = CompactionConfig(min_victims=2, small_file_bytes=1)  # nothing small
        assert select_victims(snap, cfg) == []
        # >=50% deleted makes a large-file victim
        f0 = snap.fragments[0]
        f0.dv = {"path": "dv/x.parquet", "count": f0.rows // 2 + 1}
        assert select_victims(snap, cfg) == []  # below min_victims
        assert [f.fragment_id for f in select_victims(snap, cfg, mode="force")] \
            == [f0.fragment_id]
        assert len(select_victims(snap, cfg, mode="full")) == len(snap.fragments)

    def test_plan_groups_deterministic_packing(self, tmp_table):
        snap = load(tmp_table)
        groups = plan_groups(snap.fragments, target_bytes=snap.fragments[0].size_bytes * 2)
        assert sum(len(g) for g in groups) == len(snap.fragments)
        assert all(len(g) >= 1 for g in groups)
        assert groups == plan_groups(snap.fragments,
                                     target_bytes=snap.fragments[0].size_bytes * 2)

    def test_isolation_old_version_unchanged(self, tmp_table):
        v1 = scan_arrow(tmp_table, 1, sort_by="image_id")
        compact(tmp_table, cfg=CFG)
        assert scan_arrow(tmp_table, 1, sort_by="image_id").equals(v1)

    def test_actor_pool_reencode(self, tmp_table):
        cfg = CompactionConfig(min_victims=2, output_target_bytes=2 * 1024 * 1024,
                               reencode_concurrency=2)
        before = scan_arrow(tmp_table, sort_by="image_id")
        compact(tmp_table, cfg=cfg)
        after = scan_arrow(tmp_table, sort_by="image_id")
        assert after.equals(before.select(after.column_names).cast(after.schema))
