"""Run-level metrics in snapshot commits + per-partition wall_sec in
lineage (the north rule's "per-partition lineage + metrics")."""

import pytest

from moonlink_ray.bootstrap import write_cdc_parquet
from moonlink_ray.manifest import load, read_lineage
from moonlink_ray.metrics import history
from moonlink_ray.pipelines.compact import CompactionConfig, compact
from moonlink_ray.pipelines.expire import expire
from moonlink_ray.pipelines.merge import merge


@pytest.fixture()
def merged_table(ray_session, tmp_table, tmp_path):
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=200, n_ops=40)
    merge(tmp_table, cdc, run_id="mrun")
    return tmp_table


def test_merge_commit_metrics(merged_table):
    m = load(merged_table).job["metrics"]
    assert m["rows_before"] == 200
    assert m["rows_after"] == load(merged_table).total_rows
    assert m["cdc_ops"] == 40
    assert m["wall_sec"] > 0
    assert m["new_fragments"] >= 1
    assert m["new_bytes"] > 0


def test_per_partition_lineage_has_wall_sec(merged_table):
    recs = read_lineage(merged_table, "mrun")
    spans = [r for k, r in recs.items() if k.startswith("adopt-")]
    assert spans
    assert all("wall_sec" in r for r in spans)


def test_compact_and_expire_metrics(merged_table):
    compact(merged_table, mode="force",
            cfg=CompactionConfig(output_target_bytes=1 << 20), run_id="crun")
    m = load(merged_table).job["metrics"]
    assert m["victims"] >= 2 and m["groups"] >= 1 and m["wall_sec"] > 0
    # compaction must not change live rows
    assert m["rows_before"] == m["rows_after"]
    recs = read_lineage(merged_table, "crun")
    assert all("wall_sec" in r for k, r in recs.items()
               if k.startswith("group-"))
    rep = expire(merged_table, keep_last=1)
    assert rep["metrics"]["expired_versions"] == len(rep["expired_versions"])


def test_metrics_history(merged_table):
    h = history(merged_table)
    kinds = [e["kind"] for e in h]
    assert kinds[0] == "init" and "merge" in kinds
    assert h[-1]["metrics"]["rows_after"] == load(merged_table).total_rows
