"""Schema evolution (the T10 gap): ALTER ADD/DROP COLUMN as
metadata-only commits with projection-on-read.

Reference semantics: ``AlterTableRequest {new_columns, dropped_columns}``
(``/root/reference/src/moonlink/src/storage/mooncake_table.rs:96-123``,
gating ``:572-607``). Here the active schema lives in the snapshot, so
schema changes get snapshot isolation for free: a reader at the
pre-ALTER version still sees the old columns.
"""

import pyarrow as pa
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.compact import CompactionConfig, compact
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.schema import alter_table, table_schema
from moonlink_ray.sources.scan import scan_arrow


def _table(tmp_path, rows=120):
    root = str(tmp_path / "tbl")
    bootstrap_images_table(root, rows, rows_per_fragment=32)
    return root


@pytest.mark.usefixtures("ray_session")
class TestSchemaAlter:
    def test_add_column_null_fills_old_rows(self, tmp_path):
        root = _table(tmp_path)
        alter_table(root, add=[("tag", "string")])
        t = scan_arrow(root)
        assert "tag" in t.column_names
        assert t["tag"].null_count == t.num_rows
        assert t.schema.field("tag").type == pa.string()

    def test_add_column_then_merge_then_scan(self, tmp_path):
        # the VERDICT round-trip: add column -> merge -> scan shows
        # every row (old base + new CDC) null-filled
        root = _table(tmp_path)
        alter_table(root, add=[("score", "float64")])
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=120, n_ops=40)
        merge(root, cdc)
        t = scan_arrow(root)
        assert "score" in t.column_names
        assert t["score"].null_count == t.num_rows

    def test_drop_column_hidden_everywhere(self, tmp_path):
        root = _table(tmp_path)
        before = scan_arrow(root)
        assert "caption" in before.column_names
        alter_table(root, drop=["caption"])
        t = scan_arrow(root)
        assert "caption" not in t.column_names
        # compaction rewrites fragments under the new schema: the
        # dropped column is physically gone from the new files
        compact(root, mode="full",
                cfg=CompactionConfig(output_target_bytes=1 << 20))
        t2 = scan_arrow(root)
        assert "caption" not in t2.column_names
        assert t2.num_rows == before.num_rows

    def test_schema_snapshot_isolation(self, tmp_path):
        root = _table(tmp_path)
        v_before = load(root).version
        alter_table(root, drop=["caption"])
        old = scan_arrow(root, version=v_before)
        new = scan_arrow(root)
        assert "caption" in old.column_names
        assert "caption" not in new.column_names

    def test_alter_gating(self, tmp_path):
        root = _table(tmp_path)
        with pytest.raises(ValueError):
            alter_table(root, drop=["image_id"])  # engine key
        with pytest.raises(ValueError):
            alter_table(root, drop=["no_such_column"])
        with pytest.raises(ValueError):
            alter_table(root, add=[("caption", "string")])  # duplicate
        with pytest.raises(ValueError):
            alter_table(root, add=[("x", "decimal")])  # unknown type
        # failed alters must not have committed anything
        assert load(root).schema is None

    def test_maintenance_carries_schema_forward(self, tmp_path):
        root = _table(tmp_path)
        alter_table(root, add=[("tag", "string")])
        compact(root, mode="full",
                cfg=CompactionConfig(output_target_bytes=1 << 20))
        snap = load(root)
        assert "tag" in table_schema(snap).names
        t = scan_arrow(root)
        assert t["tag"].null_count == t.num_rows
