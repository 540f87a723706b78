"""Fused OPTIMIZE == compact followed by cluster, in one pass."""

import pyarrow.compute as pc

from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.cluster import cluster
from moonlink_ray.pipelines.compact import CompactionConfig, compact
from moonlink_ray.pipelines.optimize import optimize
from moonlink_ray.sources.scan import scan_arrow


def _sorted(t):
    return t.take(pc.sort_indices(t["image_id"]))


class TestOptimize:
    def test_matches_compact_then_cluster(self, ray_session, tmp_path):
        cfg = CompactionConfig(output_target_bytes=4 * 1024 * 1024)
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        for r in (ra, rb):
            bootstrap_images_table(r, 300, rows_per_fragment=64)
        compact(ra, mode="full", cfg=cfg)
        cluster(ra, fragment_target_bytes=cfg.output_target_bytes)
        optimize(rb, cfg=cfg)

        ta, tb = _sorted(scan_arrow(ra)), _sorted(scan_arrow(rb))
        # identical content: same rows, byte-identical re-encode
        # (idempotent codec), caption equality — the north-rule scan
        # invariant with one fewer full rewrite pass
        assert ta.equals(tb)

        snap = load(rb)
        assert snap.job["kind"] == "optimize"
        # clustering took effect: >1 fragment and phash zone maps are
        # narrower than the full domain for at least half the fragments
        frags = snap.fragments
        assert len(frags) > 1
        spans = [f.stats["phash"][1] - f.stats["phash"][0] for f in frags]
        domain = max(f.stats["phash"][1] for f in frags) - \
            min(f.stats["phash"][0] for f in frags)
        assert sum(s < domain / 2 for s in spans) >= len(frags) / 2
