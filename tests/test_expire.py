import os

import pytest

from moonlink_ray.bootstrap import write_cdc_parquet
from moonlink_ray.fragments import write_fragment
from moonlink_ray.manifest import list_versions, load
from moonlink_ray.pipelines.compact import CompactionConfig, compact
from moonlink_ray.pipelines.cluster import cluster
from moonlink_ray.pipelines.expire import expire
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow
from moonlink_ray import synth

CFG = CompactionConfig(min_victims=2, output_target_bytes=2 * 1024 * 1024)


@pytest.mark.usefixtures("ray_session")
class TestExpire:
    def _make_history(self, tmp_table, tmp_path):
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=200, n_ops=60)
        merge(tmp_table, cdc)        # v2
        compact(tmp_table, cfg=CFG)  # v3
        cluster(tmp_table)           # v4
        return tmp_table

    def test_retention_and_reachability(self, tmp_table, tmp_path):
        root = self._make_history(tmp_table, tmp_path)
        v3 = scan_arrow(root, 3, sort_by="image_id")
        v4 = scan_arrow(root, 4, sort_by="image_id")
        report = expire(root, keep_last=2)
        assert report["retained_versions"] == [3, 4]
        assert report["deleted_files"] > 0
        assert list_versions(root) == [3, 4]
        # retained versions scan identically after expire
        assert scan_arrow(root, 3, sort_by="image_id").equals(v3)
        assert scan_arrow(root, 4, sort_by="image_id").equals(v4)
        # expired version's files are gone
        with pytest.raises(FileNotFoundError):
            scan_arrow(root, 1)

    def test_orphans_from_aborted_run_removed(self, tmp_table, tmp_path):
        root = self._make_history(tmp_table, tmp_path)
        # simulate an aborted run: fragment written, never committed
        orphan = write_fragment(root, synth.build_rows(range(3)), "frag-aborted-x")
        orphan_path = os.path.join(root, orphan.path)
        assert os.path.exists(orphan_path)
        expire(root, keep_last=2)
        assert not os.path.exists(orphan_path)

    def test_keep_all_when_k_large(self, tmp_table, tmp_path):
        root = self._make_history(tmp_table, tmp_path)
        report = expire(root, keep_last=10, clean_orphans=False)
        assert report["expired_versions"] == []
        assert list_versions(root) == [0, 1, 2, 3, 4]
        assert scan_arrow(root, 1).num_rows == 200
