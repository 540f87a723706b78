"""Fused OPTIMIZE == compact followed by cluster, in one pass; the
incremental mode rewrites only small/interleaving fragments."""

import pyarrow.compute as pc

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.manifest import load
from moonlink_ray.pipelines.cluster import cluster
from moonlink_ray.pipelines.compact import CompactionConfig, compact
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.pipelines.optimize import (optimize,
                                             select_optimize_victims)
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

    def test_incremental_rewrites_only_interlopers(self, ray_session,
                                                   tmp_path):
        cfg = CompactionConfig(output_target_bytes=4 * 1024 * 1024,
                               small_file_bytes=256 * 1024,
                               min_victims=2)
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 400, rows_per_fragment=64)
        optimize(root, cfg=cfg)  # full: table now Z-clustered
        clustered = {f.fragment_id for f in load(root).fragments}

        # two CDC files -> MERGE adopts (at least) two span fragments,
        # i.e. two zgen-less interlopers for the incremental pass
        import pyarrow.parquet as pq
        cdc = str(tmp_path / "cdc.parquet")
        write_cdc_parquet(cdc, n_base=400, n_ops=60)
        t = pq.read_table(cdc)
        cdc_a, cdc_b = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
        pq.write_table(t.slice(0, 30), cdc_a)
        pq.write_table(t.slice(30), cdc_b)
        merge(root, [cdc_a, cdc_b])
        snap = load(root)
        merged_rows = snap.total_rows

        victims = select_optimize_victims(snap, cfg)
        vict_ids = {f.fragment_id for f in victims}
        # the wide merge-written fragments are victims; most clustered
        # fragments are not
        assert any(f not in clustered for f in vict_ids)
        survivors = clustered & {f.fragment_id for f in snap.fragments}
        assert len(survivors - vict_ids) > len(survivors) / 2

        out = optimize(root, cfg=cfg, mode="incremental")
        assert out is not None and out.job["kind"] == "optimize"
        after = {f.fragment_id for f in out.fragments}
        # retained fragments survive untouched; victims are gone
        assert (survivors - vict_ids) <= after
        assert not (vict_ids & after)
        # content: row count preserved and ids unique
        t = scan_arrow(root)
        assert t.num_rows == merged_rows
        assert len(set(t["image_id"].to_pylist())) == merged_rows

        # converges: small tail fragments of each generation may need
        # one more fold, but within a bounded number of passes the
        # selector finds nothing (and content never changes)
        for _ in range(3):
            nxt = optimize(root, cfg=cfg, mode="incremental")
            if nxt is None:
                break
        else:
            raise AssertionError("incremental optimize did not converge")
        t = scan_arrow(root)
        assert t.num_rows == merged_rows
