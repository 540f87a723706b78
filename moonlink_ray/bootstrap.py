"""Bootstrap deterministic image tables as committed fragment/manifest roots.

Mirrors moonlink's Parquet bulk load (``LoadFiles``,
``/root/reference/src/moonlink/src/storage/mooncake_table/
batch_ingestion.rs:21-88``): data lands as many deliberately small
fragments (default 256 rows) so compaction has real work, and the
manifest is committed once at the end.

Generation is itself a Ray Data pipeline (one task per fragment) so a
bench-scale table (100k+ wide rows) is built in parallel; results are
cached on disk keyed by (n_rows, seed) so repeated test/bench runs skip
synthesis.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

import pyarrow as pa
import pyarrow.parquet as pq

from . import synth
from .fragments import write_fragment
from .manifest import FragmentMeta, commit, init_table, load

_RAY_THRESHOLD = 8_000  # below this, driver-side generation is faster than task overhead


def _gen_and_write(root: str, part: int, start: int, stop: int, seed: int,
                   scale: int = 1) -> FragmentMeta:
    table = synth.build_rows(range(start, stop), seed=seed, scale=scale)
    return write_fragment(root, table, f"frag-base-{part:06d}", lineage=[], max_lsn=0)


def bootstrap_images_table(root: str, n_rows: int, *, rows_per_fragment: int = 256,
                           seed: int = synth.SEED, scale: int = 1,
                           force: bool = False) -> None:
    """Create (or reuse) a committed images table at ``root``."""
    fingerprint = {"kind": "bootstrap", "n_rows": n_rows, "seed": seed,
                   "rows_per_fragment": rows_per_fragment, "scale": scale,
                   "synthv": synth.SYNTH_VERSION}
    from .fs import for_root
    if for_root(root).exists("version-hint.text"):
        if not force:
            try:
                snap = load(root, 1)
                # subset compare: commit() appends a "metrics" key
                if {k: snap.job.get(k) for k in fingerprint} == fingerprint:
                    return  # cached
            except Exception:
                pass
        # stale cache (different fingerprint): wipe before re-init, or
        # the rebuild's v1 commit conflicts with the old table's v1
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    init_table(root)
    parts = []
    start = 0
    while start < n_rows:
        parts.append((len(parts), start, min(start + rows_per_fragment, n_rows)))
        start += rows_per_fragment

    import ray
    if n_rows >= _RAY_THRESHOLD and ray.is_initialized():
        import ray.data as rd
        items = [{"part": p, "start": s, "stop": e} for p, s, e in parts]

        def write_part(batch: pa.Table) -> pa.Table:
            metas = []
            for row in batch.to_pylist():
                m = _gen_and_write(root, row["part"], row["start"], row["stop"],
                                   seed, scale)
                metas.append(json.dumps(asdict(m)))
            return pa.table({"meta": pa.array(metas, pa.string())})

        ds = rd.from_items(items, override_num_blocks=len(items))
        meta_rows = ds.map_batches(write_part, batch_size=None,
                                   batch_format="pyarrow").take_all()
        metas = [FragmentMeta.from_dict(json.loads(r["meta"])) for r in meta_rows]
    else:
        metas = [_gen_and_write(root, p, s, e, seed, scale) for p, s, e in parts]

    metas.sort(key=lambda m: m.fragment_id)
    commit(root, metas, max_lsn=0, job=fingerprint, expected_parent=0)


def register_parquet_files(root: str, paths: list[str], *,
                           max_lsn: int = 0, run_id: str | None = None,
                           split_target_bytes: int | None = None):
    """Bulk load: register existing Parquet files as table fragments
    WITHOUT rewriting their data — the moonlink ``LoadFiles`` analog
    (``/root/reference/src/moonlink/src/storage/mooncake_table/
    batch_ingestion.rs:21-88``: files are adopted as-is; only the
    identity columns are scanned to build the index, there 64-way
    concurrent). Here the stats scan is a column-pruned parallel
    ``map_batches`` over the file list and the "index" is the zone-map
    stats entry. Returns the new snapshot.

    A file larger than ~1.5x ``split_target_bytes`` (default: the
    table config's ``fragment_target_bytes``) is adopted as MULTIPLE
    row-group-span fragments (the same ``rg_span`` machinery MERGE
    uses for CDC adoption): one monolithic external dump would
    otherwise become ONE fragment = one read task for every downstream
    scan/compact/export, serializing the table behind a single core.
    Spans follow row-group boundaries, so adoption still moves zero
    payload bytes."""
    import uuid

    import ray.data as rd

    from .fragments import STATS_COLUMNS, _col_stats
    from .manifest import init_table

    run_id = run_id or uuid.uuid4().hex[:12]
    from .fs import for_root
    if not for_root(root).exists("version-hint.text"):
        init_table(root)
        parent, existing = 0, []
    else:
        snap = load(root)
        parent, existing = snap.version, list(snap.fragments)
    if split_target_bytes is None:
        from .table_config import load_table_config
        split_target_bytes = \
            load_table_config(root).cluster.fragment_target_bytes

    items = [{"path": os.path.abspath(p), "n": i}
             for i, p in enumerate(sorted(paths))]

    def probe(batch: pa.Table) -> pa.Table:
        metas = []
        for row in batch.to_pylist():
            pf = pq.ParquetFile(row["path"])
            names = {f_.name for f_ in pf.schema_arrow}
            missing = set(synth.IMAGES_SCHEMA.names) - names
            if missing:
                raise ValueError(
                    f"{row['path']} missing columns {sorted(missing)}")
            stat_cols = [c for c in STATS_COLUMNS if c in names]
            fmeta = pf.metadata
            file_bytes = os.path.getsize(row["path"])
            # total_byte_size is the UNCOMPRESSED row-group size (the
            # only per-rg size pyarrow exposes here); prorate it to the
            # physical file size so span size_bytes stay true-scale for
            # the compaction victim policy and read-size estimates
            raw = [fmeta.row_group(i).total_byte_size
                   for i in range(fmeta.num_row_groups)]
            scale = file_bytes / max(1, sum(raw))
            rg_bytes = [int(b * scale) for b in raw]
            # partition row groups into spans of ~target bytes; a file
            # under 1.5x target (or a single row group) stays whole
            spans = []
            if file_bytes > 1.5 * split_target_bytes and len(rg_bytes) > 1:
                start, acc = 0, 0
                for i, b in enumerate(rg_bytes):
                    acc += b
                    if acc >= split_target_bytes and i + 1 > start:
                        spans.append((start, i + 1))
                        start, acc = i + 1, 0
                if start < len(rg_bytes):
                    spans.append((start, len(rg_bytes)))
            if len(spans) <= 1:
                t = pq.read_table(row["path"], columns=stat_cols)
                metas.append(json.dumps(asdict(FragmentMeta(
                    fragment_id=f"frag-load-{run_id}-{row['n']:06d}",
                    path=row["path"],  # absolute: data adopted in place
                    rows=fmeta.num_rows,
                    size_bytes=file_bytes,
                    stats=_col_stats(t),
                    dv=None, lineage=[], max_lsn=max_lsn))))
                continue
            rg_rows = [fmeta.row_group(i).num_rows
                       for i in range(fmeta.num_row_groups)]
            row0 = 0
            for k, (rg0, rg1) in enumerate(spans):
                t = pf.read_row_groups(list(range(rg0, rg1)),
                                       columns=stat_cols)
                metas.append(json.dumps(asdict(FragmentMeta(
                    fragment_id=(f"frag-load-{run_id}-{row['n']:06d}"
                                 f"-s{k:04d}"),
                    path=row["path"],
                    rows=t.num_rows,
                    size_bytes=sum(rg_bytes[rg0:rg1]),
                    stats=_col_stats(t),
                    dv=None, lineage=[], max_lsn=max_lsn,
                    rg_span=[rg0, rg1, row0]))))
                row0 += sum(rg_rows[rg0:rg1])
        return pa.table({"meta": pa.array(metas, pa.string())})

    ds = rd.from_items(items, override_num_blocks=len(items))
    rows = ds.map_batches(probe, batch_size=1, batch_format="pyarrow").take_all()
    new = [FragmentMeta.from_dict(json.loads(r["meta"])) for r in rows]
    final = existing + new
    final.sort(key=lambda m: m.fragment_id)
    return commit(root, final, max_lsn=max(max_lsn, 0 if parent == 0 else snap.max_lsn),
                  job={"kind": "load-files", "run_id": run_id,
                       "paths": [it["path"] for it in items]},
                  expected_parent=parent)


def append_dataset(root: str, data, *, run_id: str | None = None,
                   max_lsn: int | None = None,
                   fragment_target_bytes: int = 64 * 1024 * 1024):
    """Append a Dataset (or Arrow table) to the table as new fragments.

    The batch analog of moonlink's REST row ingest
    (``/root/reference/src/moonlink_service/src/rest_api.rs:196-210``):
    plain inserts, no key reconciliation — rows with existing keys
    become duplicates exactly as repeated REST inserts would; use MERGE
    for upsert semantics. Each input block is conformed to the table's
    active schema (missing nullable columns null-filled, unknown
    columns dropped), chunked to ``fragment_target_bytes`` of payload,
    and written in parallel; one commit appends all fragments
    atomically, so a killed run leaves the table at its prior snapshot
    (plus harmless orphan files that expire's GC removes).
    """
    import uuid as _uuid

    import ray.data as rd

    from .schema import conform_table, table_schema

    run_id = run_id or _uuid.uuid4().hex[:12]
    snap = load(root)
    schema = table_schema(snap)
    lsn = snap.max_lsn if max_lsn is None else max_lsn
    if isinstance(data, pa.Table):
        data = rd.from_arrow(data)
    if "image_id" not in data.schema().names:
        raise ValueError("append requires the key column image_id")

    from .pipelines.merge import _chunk_by_bytes

    def write_blocks(batch: pa.Table) -> pa.Table:
        batch = conform_table(batch, schema, keep_extra=())
        metas = []
        for chunk in _chunk_by_bytes(batch, fragment_target_bytes):
            frag_id = f"frag-append-{run_id}-{_uuid.uuid4().hex[:10]}"
            metas.append(write_fragment(root, chunk, frag_id,
                                        lineage=[], max_lsn=lsn))
        return pa.table({"meta": pa.array(
            [json.dumps(asdict(m)) for m in metas], pa.string())})

    rows = data.map_batches(write_blocks, batch_format="pyarrow").take_all()
    new = [FragmentMeta.from_dict(json.loads(r["meta"])) for r in rows]
    final = list(snap.fragments) + [m for m in new if m.rows > 0]
    final.sort(key=lambda m: m.fragment_id)
    return commit(root, final, max_lsn=max(snap.max_lsn, lsn),
                  job={"kind": "append", "run_id": run_id,
                       "fragments": len(new)},
                  expected_parent=snap.version)


def write_cdc_parquet(path: str, n_base: int, n_ops: int, *,
                      seed: int = synth.SEED + 1, start_lsn: int = 1_000,
                      row_group_size: int = 256,
                      force: bool = False) -> str:
    """Materialize a deterministic CDC batch as one Parquet file (cached).

    Row groups match the fragment writer's (fragments.ROW_GROUP_SIZE):
    a CDC producer tuned like moonlink's 128 MiB flush target writes
    groups MERGE can adopt as right-sized span fragments (bench-scale
    images make 256 rows ~ 75 MB)."""
    marker = path + ".fp.json"
    fingerprint = {"n_base": n_base, "n_ops": n_ops, "seed": seed,
                   "start_lsn": start_lsn, "synthv": synth.SYNTH_VERSION,
                   "rgs": row_group_size}
    if not force and os.path.exists(path) and os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == fingerprint:
                return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    table = synth.build_cdc(n_base, n_ops, seed=seed, start_lsn=start_lsn)
    pq.write_table(table, path + ".tmp", row_group_size=row_group_size)
    os.replace(path + ".tmp", path)
    with open(marker, "w") as f:
        json.dump(fingerprint, f)
    return path
