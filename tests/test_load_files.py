"""Bulk load (moonlink LoadFiles analog): adopt existing Parquet files
as fragments without rewriting; mirrors batch_ingestion.rs:21-120."""

import os

import pyarrow.parquet as pq
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import bootstrap_images_table, register_parquet_files
from moonlink_ray.manifest import load
from moonlink_ray.sources.scan import scan_arrow


@pytest.mark.usefixtures("ray_session")
class TestLoadFiles:
    def test_register_into_fresh_table(self, tmp_path):
        p1 = str(tmp_path / "a.parquet")
        p2 = str(tmp_path / "b.parquet")
        pq.write_table(synth.build_rows(range(0, 50)), p1)
        pq.write_table(synth.build_rows(range(50, 80)), p2)
        root = str(tmp_path / "t")
        snap = register_parquet_files(root, [p1, p2])
        assert snap.version == 1 and snap.total_rows == 80
        got = scan_arrow(root, sort_by="image_id")
        assert got.num_rows == 80
        # data adopted in place, not copied
        assert all(os.path.isabs(f.path) for f in snap.fragments)
        # zone maps present for pruning
        assert all("image_id" in f.stats for f in snap.fragments)

    def test_register_into_existing_table(self, tmp_path):
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 40, rows_per_fragment=20)
        p = str(tmp_path / "extra.parquet")
        pq.write_table(synth.build_rows(range(1000, 1025)), p)
        snap = register_parquet_files(root, [p])
        assert snap.version == 2 and snap.total_rows == 65
        assert scan_arrow(root).num_rows == 65
        # isolation: v1 scan unchanged
        assert scan_arrow(root, 1).num_rows == 40

    def test_schema_mismatch_rejected(self, tmp_path):
        import pyarrow as pa
        p = str(tmp_path / "bad.parquet")
        pq.write_table(pa.table({"x": [1, 2]}), p)
        root = str(tmp_path / "t")
        with pytest.raises(Exception, match="missing columns"):
            register_parquet_files(root, [p])
