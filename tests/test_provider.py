"""Pushdown read provider (provider.py) — the moonlink_datafusion
TableProvider analog: an external engine consumes a DV'd snapshot as a
plain Arrow stream while zone-map pruning keeps pruned fragments from
ever being opened."""

import duckdb
import numpy as np
import pytest

from moonlink_ray.bootstrap import bootstrap_images_table, write_cdc_parquet
from moonlink_ray.pipelines.merge import merge
from moonlink_ray.provider import TableProvider
from moonlink_ray.sources.scan import scan_arrow


@pytest.fixture()
def dv_table(tmp_path):
    root = str(tmp_path / "t")
    bootstrap_images_table(root, 200, rows_per_fragment=32)
    cdc = str(tmp_path / "cdc.parquet")
    write_cdc_parquet(cdc, n_base=200, n_ops=60)   # DVs + adopted spans
    merge(root, cdc)
    return root


@pytest.mark.usefixtures("ray_session")
def test_external_duckdb_read_matches_engine_scan(dv_table):
    """DuckDB registers the provider's RecordBatchReader directly (no
    knowledge of manifests, DV sidecars or spans) and sees exactly the
    snapshot's live rows."""
    prov = TableProvider(dv_table)
    con = duckdb.connect()
    con.register("snap", prov.scanner(
        columns=["image_id", "caption", "phash"]))
    got = con.execute("SELECT image_id, caption, phash FROM snap "
                      "ORDER BY image_id, caption").fetch_arrow_table()
    want = scan_arrow(dv_table, columns=["image_id", "caption", "phash"])
    import pyarrow.compute as pc
    keys = [("image_id", "ascending"), ("caption", "ascending")]
    want = want.take(pc.sort_indices(want, sort_keys=keys))
    assert got.equals(want.cast(got.schema))


@pytest.mark.usefixtures("ray_session")
def test_zone_map_pruning_never_opens_pruned_fragments(dv_table):
    prov = TableProvider(dv_table)
    all_ids = {f.fragment_id for f in prov.plan()}
    # bootstrap fragments are written in image_id order, so their
    # image_id zone maps are tight ranges: a key-range predicate must
    # prune most fragments without opening any
    lo, hi = "img-000000000000", "img-000000000099"
    pred = {"image_id": (lo, hi)}
    kept = {f.fragment_id for f in prov.plan(pred)}
    assert kept < all_ids, "predicate must prune at least one fragment"

    t = prov.read_all(columns=["image_id", "phash"], predicate=pred)
    # instrumentation: only planned fragments were opened
    assert set(prov.opened_fragments) == kept
    # exactness: residual filter equals a brute-force row filter
    want = scan_arrow(dv_table, columns=["image_id", "phash"])
    w = want.to_pandas()
    w = w[(w["image_id"] >= lo) & (w["image_id"] <= hi)]
    g = t.to_pandas()
    assert sorted(g["image_id"]) == sorted(w["image_id"])
    assert int(g["phash"].sum()) == int(w["phash"].sum())


@pytest.mark.usefixtures("ray_session")
def test_provider_applies_dvs_as_row_selections(dv_table):
    """Raw file rows minus DV cardinality == provider rows (the DV is
    applied inside the scan, not by a reader-side anti-join)."""
    import pyarrow.parquet as pq
    prov = TableProvider(dv_table)
    raw_rows = dead = 0
    for f in prov.plan():
        if f.dv:
            dead += f.dv["count"]
        raw_rows += f.rows
    assert dead > 0, "fixture must carry deletion vectors"
    got = prov.read_all(columns=["image_id"])
    assert got.num_rows == raw_rows - dead

    # snapshot pinning: a provider resolved at version 1 still sees the
    # pre-merge table
    prov1 = TableProvider(dv_table, version=1)
    base = prov1.read_all(columns=["image_id"])
    assert base.num_rows == 200


@pytest.mark.usefixtures("ray_session")
def test_predicate_on_unprojected_column_is_exact(dv_table):
    """A predicate column missing from `columns` must still filter
    rows exactly (it is read internally and dropped from the output),
    not silently degrade to fragment-level pruning."""
    prov = TableProvider(dv_table)
    lo, hi = "img-000000000010", "img-000000000039"
    t = prov.read_all(columns=["phash"],
                      predicate={"image_id": (lo, hi)})
    assert t.column_names == ["phash"]
    want = scan_arrow(dv_table, columns=["image_id", "phash"]).to_pandas()
    want = want[(want["image_id"] >= lo) & (want["image_id"] <= hi)]
    assert t.num_rows == len(want)
    assert int(t.to_pandas()["phash"].sum()) == int(want["phash"].sum())
