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


@pytest.mark.usefixtures("ray_session")
def test_register_splits_large_file_into_span_fragments(tmp_path):
    """A monolithic external parquet adopts as multiple row-group-span
    fragments (rg_span machinery), so downstream scans parallelize —
    while still moving zero payload bytes (the file is referenced in
    place) and scanning back byte-identically."""
    import pyarrow.parquet as pq

    from moonlink_ray import synth
    from moonlink_ray.bootstrap import register_parquet_files
    from moonlink_ray.manifest import init_table, load
    from moonlink_ray.sources.scan import scan_arrow

    rows = synth.build_rows(list(range(96)))
    dump = str(tmp_path / "big.parquet")
    pq.write_table(rows, dump, row_group_size=16, compression="NONE")

    root = str(tmp_path / "t")
    init_table(root)
    register_parquet_files(root, [dump], split_target_bytes=1)  # force
    snap = load(root)
    spans = [f for f in snap.fragments if f.rg_span]
    assert len(spans) == 6                      # 96 rows / 16-row rgs
    assert sum(f.rows for f in spans) == 96
    # spans tile the file contiguously with correct first-row offsets
    spans.sort(key=lambda f: f.rg_span[2])
    row0 = 0
    for f in spans:
        assert f.rg_span[2] == row0
        row0 += f.rows
        assert f.path == dump                   # adopted in place
    # content equality through the span reads
    got = scan_arrow(root, columns=["image_id", "caption"])
    import pyarrow.compute as pc
    got = got.take(pc.sort_indices(got["image_id"]))
    want = rows.select(["image_id", "caption"])
    want = want.take(pc.sort_indices(want["image_id"]))
    assert got.equals(want)
    # per-span zone maps are tighter than the whole file's
    los = [f.stats["image_id"][0] for f in spans]
    assert len(set(los)) == len(spans)
