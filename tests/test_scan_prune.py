"""Zone-map predicate pushdown on the scan path.

The read-side analog of moonlink's persisted-index probe
(``/root/reference/src/moonlink/src/storage/index/
persisted_bucket_hash_map.rs:116-203``): after Z-order clustering, a
range predicate must touch only the fragments whose zone maps intersect
it, and the surviving rows must equal an exact filter of the full scan.
"""

import pyarrow.compute as pc
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.cluster import cluster
from moonlink_ray.sources.scan import prune_fragments, scan, scan_arrow

PHASH_RANGE = (0, 2 ** 61)


@pytest.mark.usefixtures("ray_session")
class TestScanPrune:
    def test_prune_reads_fewer_fragments_after_cluster(self, tmp_path):
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 600, rows_per_fragment=64)
        cluster(root)
        frags = load(root).fragments
        pruned = prune_fragments(frags, {"phash": PHASH_RANGE})
        # Z-order localizes phash: a 1/8-domain probe must skip most
        # fragments (this is the property clustering exists to provide)
        assert 0 < len(pruned) < len(frags)

    def test_predicate_scan_matches_exact_filter(self, tmp_path):
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 400, rows_per_fragment=64)
        cluster(root)
        lo, hi = PHASH_RANGE
        got = scan(root, predicate={"phash": PHASH_RANGE}).to_pandas()
        full = scan_arrow(root)
        want = full.filter(pc.and_(pc.greater_equal(full["phash"], lo),
                                   pc.less_equal(full["phash"], hi)))
        assert sorted(got["image_id"]) == sorted(
            want["image_id"].to_pylist())
        assert len(got) > 0

    def test_id_range_prunes_sequential_bootstrap(self, tmp_path):
        # bootstrap writes sequential image_id runs per fragment, so an
        # id range predicate prunes even before clustering
        root = str(tmp_path / "tbl")
        bootstrap_images_table(root, 512, rows_per_fragment=64)
        frags = load(root).fragments
        pred = {"image_id": ("img-000000000100", "img-000000000199")}
        pruned = prune_fragments(frags, pred)
        assert len(pruned) < len(frags)
        got = scan(root, predicate=pred).to_pandas()
        assert len(got) == 100
        assert got["image_id"].min() >= "img-000000000100"
        assert got["image_id"].max() <= "img-000000000199"
