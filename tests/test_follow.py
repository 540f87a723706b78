"""FOLLOW (live CDC tail): micro-batched directory ingestion matches a
single MERGE of the same files, the cursor skips applied files, and a
lost cursor is safe (LSN-discard idempotence, SURVEY.md §2.8)."""

import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.follow import follow, poll_once
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.sources.scan import scan_arrow


def _sorted(t):
    return t.take(pc.sort_indices(t["image_id"]))


def _split_cdc(cdc_path, out_dir, parts=3):
    """Split one CDC batch into LSN-contiguous files (producer order)."""
    t = pq.read_table(cdc_path)
    t = t.take(pc.sort_indices(t, sort_keys=[("_lsn", "ascending"),
                                             ("_seq", "ascending")]))
    os.makedirs(out_dir, exist_ok=True)
    n = t.num_rows
    paths = []
    for i in range(parts):
        part = t.slice(i * n // parts, (i + 1) * n // parts - i * n // parts)
        p = os.path.join(out_dir, f"cdc-{i:04d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


@pytest.mark.usefixtures("ray_session")
class TestFollow:
    def test_tail_matches_single_merge(self, tmp_path):
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        bootstrap_images_table(ra, 200, rows_per_fragment=32)
        shutil.copytree(ra, rb)
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=200, n_ops=90)
        cdc_dir = str(tmp_path / "incoming")
        paths = _split_cdc(cdc, cdc_dir, parts=3)

        # reference: one merge of everything
        merge(ra, paths)

        # followed: first two files land, then the third
        third = paths[2] + ".hold"
        os.rename(paths[2], third)
        out = follow(rb, cdc_dir, poll_interval=0, idle_cycles=1)
        assert out["files_applied"] == 2 and out["merges"] == 1  # micro-batch
        os.rename(third, paths[2])
        out = follow(rb, cdc_dir, poll_interval=0, idle_cycles=1)
        assert out["files_applied"] == 1

        assert _sorted(scan_arrow(ra)).equals(_sorted(scan_arrow(rb)))

    def test_cursor_skips_applied_and_lost_cursor_is_safe(self, tmp_path):
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 120, rows_per_fragment=32)
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=120, n_ops=40)
        cdc_dir = str(tmp_path / "incoming")
        _split_cdc(cdc, cdc_dir, parts=2)

        snap, n = poll_once(root, cdc_dir)
        assert n == 2
        v = snap.version
        # nothing new -> no merge, no commit
        snap2, n2 = poll_once(root, cdc_dir)
        assert n2 == 0 and snap2 is None
        assert load(root).version == v

        # crash-lost cursor: files re-listed, but every op has
        # lsn <= max_lsn so the re-merge is the idempotent no-op
        os.remove(os.path.join(root, "follow.cursor.json"))
        snap3, n3 = poll_once(root, cdc_dir)
        assert n3 == 2
        assert snap3.version == v  # unchanged manifest, no new version

    def test_out_of_order_late_file_fails_loudly(self, tmp_path):
        """A CDC file that sorts BEFORE an already-applied name must
        raise, not silently lose its ops to the floor-LSN discard."""
        from moonlink_ray.pipelines.follow import OutOfOrderCdcFile

        root = str(tmp_path / "t")
        bootstrap_images_table(root, 120, rows_per_fragment=32)
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=120, n_ops=40)
        cdc_dir = str(tmp_path / "incoming")
        paths = _split_cdc(cdc, cdc_dir, parts=2)

        # hold back the FIRST file; apply only the second
        held = paths[0] + ".hold"
        os.rename(paths[0], held)
        snap, n = poll_once(root, cdc_dir)
        assert n == 1
        v = snap.version

        # the earlier-named file lands late: loud failure, no commit
        os.rename(held, paths[0])
        with pytest.raises(OutOfOrderCdcFile):
            poll_once(root, cdc_dir)
        assert load(root).version == v
