"""Append API: plain row ingest as new fragments (the batch analog of
moonlink's REST ingest, ``/root/reference/src/moonlink_service/src/
rest_api.rs:196-210``)."""

import pyarrow as pa
import pytest

from moonlink_ray import synth
from moonlink_ray.bootstrap import append_dataset, bootstrap_images_table
from moonlink_ray.manifest import load
from moonlink_ray.schema import alter_table
from moonlink_ray.sources.scan import scan_arrow


@pytest.mark.usefixtures("ray_session")
class TestAppend:
    def test_append_rows(self, tmp_path):
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 100, rows_per_fragment=32)
        extra = synth.build_rows(range(100, 150))
        snap = append_dataset(root, extra, max_lsn=7)
        assert snap.total_rows == 150
        assert snap.max_lsn == 7
        t = scan_arrow(root)
        assert t.num_rows == 150
        assert sorted(set(t["image_id"].to_pylist())) == \
            [synth.image_id(i) for i in range(150)]

    def test_append_is_atomic_snapshot(self, tmp_path):
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 60, rows_per_fragment=32)
        v1 = load(root).version
        append_dataset(root, synth.build_rows(range(60, 80)))
        # reader pinned at v1 still sees 60 rows (snapshot isolation)
        assert scan_arrow(root, version=v1).num_rows == 60
        assert scan_arrow(root).num_rows == 80

    def test_append_conforms_to_evolved_schema(self, tmp_path):
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 40, rows_per_fragment=32)
        alter_table(root, add=[("tag", "string")])
        append_dataset(root, synth.build_rows(range(40, 60)))
        t = scan_arrow(root)
        assert t.num_rows == 60
        assert t["tag"].null_count == 60

    def test_append_requires_key_column(self, tmp_path):
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 10, rows_per_fragment=32)
        bad = pa.table({"caption": pa.array(["x"], pa.string())})
        with pytest.raises(ValueError):
            append_dataset(root, bad)
