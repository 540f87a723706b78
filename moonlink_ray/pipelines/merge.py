"""MERGE INTO: apply a CDC batch (insert/upsert/delete @ LSN) to the table.

Moonlink resolves each CDC op with a point index probe because it is
latency-driven streaming (``MemIndex.find_record`` / ``GlobalIndex.
search_values``, ``/root/reference/src/moonlink/src/storage/index/``).
In batch form the same semantics become a shuffle + column-pruned
passes — no persisted index at all:

1. **Tombstone shards** (distributed, column-pruned): one pass over the
   CDC batch reads only the key columns + ``(_op, _lsn)``, drops stale
   ops, and writes the upsert/delete key set as RANGE-SHARDED sorted
   sidecar files (shard boundaries derived from the base fragments'
   zone-map minima, shard-aligned row groups, one spill file per task).
   The pass also returns the CDC aggregates (fresh-op count, max LSN),
   so the driver never materializes the key set — its state is
   O(shards), not O(CDC).
2. **Positional fold + file adoption** (new versions): a column-pruned
   positional read (``_SpanKeyReader``) emits only (key, _op, _lsn,
   _seq, span, row) per CDC op; hash-bucketing on the canonical
   identity key + ``groupby(_bucket).map_groups`` applies ops in
   ``(lsn, seq, delete-before-insert)`` order (exact vectorized index
   math, ``_fold_bucket`` — no per-row Python loop) and returns
   SURVIVOR POSITIONS. A second tiny exchange groups survivors by span
   and ADOPTS the CDC file itself into the table (hardlink/byte copy,
   one fragment per row-group span, a DV over non-surviving rows) —
   the batch analog of moonlink's flushed disk slice BECOMING the data
   file (``storage/mooncake_table/disk_slice.rs``): image payload is
   never shuffled and never rewritten; MERGE moves O(keys) bytes, not
   O(CDC) bytes. One adopted span == one lineage checkpoint, so a
   killed run resumes span-by-span.
3. **DV update** (old versions): fragments are pruned by key zone maps
   against the nonempty tombstone shard ranges (the batch analog of
   moonlink's file-index probe), then a per-fragment task reads *only*
   the key columns plus exactly the overlapping shard files, matches
   positions, and writes a new cumulative deletion-vector sidecar
   (copy-on-write, mirroring the cumulative DV puffin per commit,
   ``iceberg/iceberg_table_syncer.rs:313-348``). A fragment whose keys
   match nothing keeps its existing meta untouched.
4. **Commit**: untouched fragments carry over unchanged; a new manifest
   version is swapped in atomically.

Row identity (``IdentityProp``, ``row/moonlink_row.rs:270-350``): the
table's config declares ``identity.key_columns`` — one column
(SinglePrimitiveKey analog; default ``image_id``) or several (the
``Keys(vec)`` composite mode; canonical key = separator-joined string
casts, ``stages/keys.canonical_keys``) — or ``identity.mode =
"fullrow"`` (REPLICA IDENTITY FULL analog, ``moonlink_row.rs:343-349``):
no key, the 64-bit row hash is the identity, duplicates allowed, and a
delete kills exactly one instance (see ``_merge_fullrow``). Known
simplification for KEYED tables vs moonlink: base fragments hold at
most one copy per key (bootstrap + MERGE maintain this), so a tombstone
kills all base positions of its key.

Semantics preserved (SURVEY.md §2.4):
- upsert = delete-if-exists + append at one LSN
  (``rest_ingest/moonlink_rest_sink.rs:198-223``);
- within an LSN, ``_seq`` orders ops and delete sorts before insert at
  equal ``(lsn, seq)`` (CDC Update = Delete + Append,
  ``pg_replicate/moonlink_sink.rs:286-317``);
- delete_if_exists is a no-op on miss (``snapshot.rs:795-817``): a
  tombstone key absent from every fragment simply matches nothing;
- a delete at LSN L never kills rows appended at >= L: ops are applied
  in LSN order within the fold, and base rows always predate the CDC
  batch (enforced by the LSN gate below — the visibility rule of
  ``snapshot.rs:782-793``);
- duplicate replay is discarded: ops with ``lsn <= snapshot.max_lsn``
  are dropped, so re-merging an applied batch is a no-op with an
  identical manifest (mirrors ``table_handler.rs:778-784`` and
  test_discard_duplicate_writes, ``table_handler/tests.rs:1626``).

Scale notes (100 TB design): nothing in this job materializes O(CDC) or
O(base) state on the driver — the tombstone key set lives in
range-sharded files on the table's own filesystem, the fold shuffles
only CDC rows, base fragments are never rewritten (DV-only, write
amplification O(CDC)), and every wide stage checkpoints per partition.
DV tasks read only the shard files overlapping their fragment's key
range, so per-task tombstone bytes scale with the fragment's share of
the key domain, not with the CDC batch.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..fragments import read_fragment, write_dv, write_fragment
from ..fs import for_root
from ..manifest import (FragmentMeta, Snapshot, load, commit, read_lineage,
                        write_lineage)
from ..stages.keys import bucket_of, canonical_keys, key_codes
from ..synth import IMAGES_SCHEMA

# target bytes of image payload per output fragment chunk
_FRAGMENT_BYTES = 64 * 1024 * 1024
# cap on tombstone range shards; at this cap a DV task over a fragment
# spanning 1/Nth of the key domain reads ~max(1, shards/N) shard files
_MAX_TOMB_SHARDS = 256
# FullRow fall-through DV writes fan out as a Ray pass at/above this
# many touched fragments; below it a driver loop is cheaper than tasks
_RAY_DV_THRESHOLD = 64


def _fold_bucket(group: pa.Table,
                 key_columns: tuple | list = ("image_id",),
                 kcode: np.ndarray | None = None,
                 return_misses: bool = False):
    """Apply a bucket's ops in total order; return surviving row indices
    (into ``group``) and the max LSN applied.

    Exact vectorized simulation of the per-key FIFO version queue
    (numpy only — no per-op Python loop; measured ~40x over the loop
    form on a 1M-op bucket):

    - total op order within a key is ``(lsn, seq, delete-before-add)``;
    - each op expands to events: insert -> [add], delete -> [pop],
      upsert -> [pop, add] (delete-if-exists then append at one LSN);
    - a pop consumes the EARLIEST live version of its key, and misses
      (no-op) when none is live — base-table copies are handled by the
      separate tombstone pass, never here;
    - within one key the events' +1/-1 prefix sums form a walk
      reflected at zero: the number of missed pops is the depth of the
      plain walk's most negative prefix (each miss lifts the reflected
      trajectory by exactly one at a new prefix minimum), so successful
      pops s = pops - max(0, -min_prefix);
    - successful pops always consume the earliest unconsumed add, and
      adds arrive in order, so the consumed adds are exactly the FIRST
      s adds of the key: survivors = every add with per-key add rank
      >= s.
    """
    n = group.num_rows
    if n == 0:
        empty = np.empty(0, dtype=np.int64)
        return (empty, -1, empty, empty) if return_misses else (empty, -1)
    lsn = group["_lsn"].to_numpy(zero_copy_only=False)
    seq = group["_seq"].to_numpy(zero_copy_only=False)
    # all string work stays in Arrow kernels: op masks via pc.equal,
    # key grouping via dictionary encode (key_codes) — no object-array
    # sorts or elementwise Python compares in the hot path
    is_del_all = pc.equal(group["_op"], pa.scalar("delete")) \
        .to_numpy(zero_copy_only=False)
    is_up_all = pc.equal(group["_op"], pa.scalar("upsert")) \
        .to_numpy(zero_copy_only=False)
    rank = np.where(is_del_all, 0, 1).astype(np.int8)
    if kcode is None:
        kcode = key_codes(group, list(key_columns))
    order = np.lexsort((rank, seq, lsn, kcode))  # key-major, then time

    kcode_o = kcode[order]
    is_up = is_up_all[order]
    is_del = is_del_all[order]
    n_ev = 1 + is_up.astype(np.int64)           # upsert = pop + add
    ev_total = int(n_ev.sum())
    starts = np.cumsum(n_ev) - n_ev             # first event of each op
    delta = np.ones(ev_total, dtype=np.int64)   # add = +1
    delta[starts[is_del]] = -1                  # delete = pop
    delta[starts[is_up]] = -1                   # upsert's first event = pop
    ev_op = np.repeat(np.arange(n, dtype=np.int64), n_ev)
    ev_key = kcode_o[ev_op]

    seg_starts = np.flatnonzero(np.r_[True, ev_key[1:] != ev_key[:-1]])
    seg_lens = np.diff(np.r_[seg_starts, ev_total])
    g = np.cumsum(delta)
    offsets = np.r_[0, g[seg_starts[1:] - 1]]
    within = g - np.repeat(offsets, seg_lens)   # per-key prefix sums
    min_prefix = np.minimum.reduceat(within, seg_starts)
    pops = np.add.reduceat((delta == -1).astype(np.int64), seg_starts)
    s = pops - np.maximum(0, -min_prefix)       # successful pops per key

    is_add = delta == 1
    add_cum = np.cumsum(is_add)
    add_before = np.r_[0, add_cum[seg_starts[1:] - 1]]
    add_rank = add_cum - np.repeat(add_before, seg_lens) - 1
    keep = is_add & (add_rank >= np.repeat(s, seg_lens))
    survivors = np.sort(order[ev_op[keep]])
    if not return_misses:
        return survivors, int(lsn.max())
    # per-key missed pops = deletes that fall through to the base table
    # (FullRow mode consumes these with exact counts)
    misses = np.maximum(0, -min_prefix)
    hit = misses > 0
    miss_keys = ev_key[seg_starts][hit]
    return survivors, int(lsn.max()), miss_keys, misses[hit]


def _chunk_by_bytes(table: pa.Table, target: int) -> list[pa.Table]:
    """Split a table into chunks of ~target bytes of image payload."""
    if table.num_rows == 0:
        return []
    sizes = pc.binary_length(table["bytes"]).to_numpy(zero_copy_only=False)
    sizes = np.nan_to_num(sizes.astype(np.float64), nan=0.0)
    cum = np.cumsum(sizes)
    chunks, start = [], 0
    while start < table.num_rows:
        base = cum[start - 1] if start else 0.0
        stop = int(np.searchsorted(cum, base + target, side="left")) + 1
        stop = max(stop, start + 1)
        chunks.append(table.slice(start, stop - start))
        start = stop
    return chunks


def _cdc_spans(cdc_paths: list[str],
               target_bytes: int = _FRAGMENT_BYTES) -> list[dict]:
    """Bundle each CDC file's contiguous row groups into ADOPTION SPANS
    of ~target payload bytes — footer-only driver read, O(row groups)
    state. Each span becomes one fragment of the adopted file (see
    FragmentMeta.rg_span)."""
    import pyarrow.parquet as pq
    spans: list[dict] = []
    for fi, path in enumerate(cdc_paths):
        md = pq.read_metadata(path)
        row0 = 0
        cur: dict | None = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            b = int(g.total_byte_size)
            cb = sum(int(g.column(c).total_compressed_size)
                     for c in range(g.num_columns))
            if cur is None or (cur["rows"] > 0
                               and cur["bytes"] + b > target_bytes):
                if cur is not None:
                    spans.append(cur)
                cur = {"file": fi, "path": path, "rg0": rg, "rg1": rg,
                       "row0": row0, "rows": 0, "bytes": 0, "cbytes": 0}
            cur["rg1"] = rg + 1
            cur["rows"] += g.num_rows
            cur["bytes"] += b
            cur["cbytes"] += cb
            row0 += g.num_rows
        if cur is not None:
            spans.append(cur)
    for i, s in enumerate(spans):
        s["span"] = i
    return spans


class _SpanKeyReader:
    """map_batches task over span descriptors: read ONLY the identity /
    bookkeeping columns of the span's row groups and attach the span id
    + span-relative row position — the column-pruned positional read
    that lets the fold run without ever moving image payload."""

    def __init__(self, columns: list[str]):
        self.columns = list(columns)
        self.__name__ = "SpanKeyReader"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        out = []
        for row in batch.to_pylist():
            pf = pq.ParquetFile(row["path"])
            try:
                t = pf.read_row_groups(list(range(row["rg0"], row["rg1"])),
                                       columns=self.columns)
            finally:
                pf.close()
            t = t.append_column("_span", pa.array(
                np.full(t.num_rows, row["span"], dtype=np.int64)))
            t = t.append_column("_row", pa.array(
                np.arange(t.num_rows, dtype=np.int64)))
            out.append(t)
        if not out:
            sch = pa.schema([(c, pa.string()) for c in self.columns]
                            ).append(pa.field("_span", pa.int64())
                                     ).append(pa.field("_row", pa.int64()))
            return pa.table({f.name: pa.array([], f.type) for f in sch})
        return pa.concat_tables(out)


class _FoldPositions:
    """map_groups callable: fold one hash bucket of (key, op, lsn, seq)
    rows and return the SURVIVOR POSITIONS (span, row) — the payload
    never enters the exchange."""

    def __init__(self, key_columns: tuple | list):
        self.key_columns = tuple(key_columns)
        self.__name__ = "FoldPositions"

    def __call__(self, group: pa.Table) -> pa.Table:
        survivors, _ = _fold_bucket(group, self.key_columns)
        idx = pa.array(survivors, pa.int64())
        return pa.table({"_span": group["_span"].take(idx),
                         "_row": group["_row"].take(idx)})


class _AdoptSpan:
    """map_groups callable over survivor positions grouped by span:
    adopt the span's physical file into the table (hardlink/copy — NO
    payload rewrite; the batch analog of moonlink's flushed disk slice
    becoming the data file, ``storage/mooncake_table/disk_slice.rs``),
    write a DV for the span's non-surviving rows, compute zone-map
    stats over the live rows from a column-pruned read, and checkpoint
    the fragment in lineage."""

    def __init__(self, root: str, run_id: str, spans_ref,
                 done_spans: set[int], key_columns: tuple):
        self.root = root
        self.run_id = run_id
        self.spans_ref = spans_ref
        self.done = set(done_spans)
        self.key_columns = tuple(key_columns)
        self._spans = None
        self.__name__ = "AdoptSpan"

    def _span_list(self) -> list[dict]:
        if self._spans is None:
            import ray
            self._spans = (ray.get(self.spans_ref)
                           if hasattr(self.spans_ref, "hex")
                           else self.spans_ref)
        return self._spans

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..fragments import _col_stats, STATS_COLUMNS
        tp = time.perf_counter()
        span_id = int(group["_span"][0].as_py())
        if span_id in self.done:  # resumed run: meta already in lineage
            return pa.table({"meta": pa.array([], pa.string())})
        span = self._span_list()[span_id]
        fs = for_root(self.root)
        rel = f"fragments/cdc-{self.run_id}-f{span['file']:04d}.parquet"
        fs.adopt_file(span["path"], rel)
        live = np.sort(group["_row"].to_numpy(zero_copy_only=False))
        dead = np.setdiff1d(np.arange(span["rows"], dtype=np.int64), live,
                            assume_unique=True)
        frag_id = f"frag-{self.run_id}-s{span['span']:05d}"
        dv_ref = None
        if dead.size:
            dv_ref = write_dv(self.root, f"dv-{self.run_id}-{frag_id}", dead)
        # stats + max_lsn over the LIVE rows, via a column-pruned span
        # read (key/zone-map columns only — payload stays untouched)
        rg_span = [span["rg0"], span["rg1"], span["row0"]]
        have = set(fs.parquet_schema(rel).names)
        cols = [c for c in dict.fromkeys(
            list(STATS_COLUMNS) + list(self.key_columns)) if c in have]
        t = fs.read_parquet_span(rel, rg_span, columns=cols + ["_lsn"])
        mask = np.zeros(span["rows"], dtype=bool)
        mask[live] = True
        t = t.filter(pa.array(mask))
        max_lsn = int(pc.max(t["_lsn"]).as_py()) if t.num_rows else 0
        meta = FragmentMeta(
            fragment_id=frag_id, path=rel, rows=int(span["rows"]),
            size_bytes=int(span["cbytes"]), stats=_col_stats(t),
            dv=dv_ref, lineage=[], max_lsn=max_lsn, rg_span=rg_span)
        write_lineage(self.root, self.run_id, f"adopt-{span['span']:05d}", {
            "kind": "merge-adopt", "span": span_id,
            "fragments": [asdict(meta)],
            "wall_sec": round(time.perf_counter() - tp, 3),
        })
        return pa.table({"meta": pa.array([json.dumps(asdict(meta))],
                                          pa.string())})


# --------------------------------------------------- FullRow identity mode

class _BucketMergeFullrow:
    """map_groups callable for FullRow tables: fold keyed on the 64-bit
    row hash (duplicates stack; a delete kills exactly one pending
    instance), write survivors, and report the fall-through delete
    COUNTS per row hash — the exact number of base-table instances each
    key must lose (``snapshot.rs:818-824`` positional-zip analog)."""

    def __init__(self, root: str, run_id: str,
                 schema_list: list | None = None):
        from ..schema import schema_from_list
        self.root = root
        self.run_id = run_id
        self.schema = schema_from_list(schema_list) or IMAGES_SCHEMA
        self.__name__ = "BucketMergeFullrow"

    def __call__(self, group: pa.Table) -> pa.Table:
        from ..schema import conform_table
        from ..stages.keys import row_hash
        tp = time.perf_counter()
        bucket = int(group["_bucket"][0].as_py())
        kcode = group["_rhash"].to_numpy(zero_copy_only=False)
        survivors, max_lsn, miss_keys, miss_counts = _fold_bucket(
            group, kcode=kcode, return_misses=True)
        metas = []
        if len(survivors):
            out = conform_table(group.take(survivors), self.schema,
                                keep_extra=())
            for n, chunk in enumerate(_chunk_by_bytes(out, _FRAGMENT_BYTES)):
                frag_id = f"frag-{self.run_id}-b{bucket:05d}-{n:03d}"
                metas.append(write_fragment(self.root, chunk, frag_id,
                                            lineage=[], max_lsn=max_lsn))
        write_lineage(self.root, self.run_id, f"bucket-{bucket:05d}", {
            "kind": "merge-bucket", "bucket": bucket, "max_lsn": max_lsn,
            "fragments": [asdict(m) for m in metas],
            "misses": {str(int(k)): int(c)
                       for k, c in zip(miss_keys, miss_counts)},
            "wall_sec": round(time.perf_counter() - tp, 3),
        })
        rows = [json.dumps(asdict(m)) for m in metas]
        return pa.table({"kind": pa.array([0] * len(rows) + [1], pa.int8()),
                         "meta": pa.array(rows + [""], pa.string()),
                         "max_lsn": pa.array([0] * len(rows) + [max_lsn],
                                             pa.int64())})


class _FullrowDVWrite:
    """map_batches task: one (fragment meta, kill positions) row ->
    union with the fragment's existing DV, write the new cumulative DV
    sidecar, return the updated meta (JSON). Used when FullRow
    fall-through deletes touch many fragments — per-fragment filesystem
    IO then rides tasks instead of a driver loop."""

    def __init__(self, root: str, run_id: str):
        self.root, self.run_id = root, run_id
        self.__name__ = "FullrowDVWrite"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fragments import read_dv
        out = []
        for row in batch.to_pylist():
            meta = FragmentMeta.from_dict(json.loads(row["meta"]))
            new_dead = np.asarray(row["dead"], dtype=np.int64)
            if meta.dv:
                new_dead = np.union1d(new_dead,
                                      read_dv(self.root, meta.dv))
            dv_ref = write_dv(self.root,
                              f"dv-{self.run_id}-{meta.fragment_id}",
                              new_dead)
            out.append(json.dumps({**asdict(meta), "dv": dv_ref}))
        return pa.table({"meta": pa.array(out, pa.string())})


class _FullrowCandidates:
    """map_batches over fragment metas: read only the stored _rowhash
    column (live rows), match the fall-through delete hashes, emit
    (hash, fragment, pos) candidate rows. Pre-rowhash fragments fall
    back to hashing their full rows."""

    def __init__(self, root: str, miss_ref):
        self.root = root
        self.miss_ref = miss_ref
        self._miss = None

    def _misses(self) -> np.ndarray:
        if self._miss is None:
            import ray
            self._miss = (ray.get(self.miss_ref)
                          if hasattr(self.miss_ref, "hex") else self.miss_ref)
        return self._miss

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..fragments import ROWHASH_COL
        from ..fs import for_root as _fr
        from ..stages.keys import row_hash
        miss = self._misses()
        out_h, out_f, out_p = [], [], []
        for row in batch.to_pylist():
            meta = FragmentMeta.from_dict(json.loads(row["meta"]))
            have = ROWHASH_COL in _fr(self.root) \
                .parquet_schema(meta.path).names
            if have:
                t = read_fragment(self.root, meta, columns=[ROWHASH_COL],
                                  with_pos=True)
                h = t[ROWHASH_COL].to_numpy(zero_copy_only=False)
            else:
                t = read_fragment(self.root, meta, with_pos=True)
                h = row_hash(t.drop_columns(["_pos"]))
            hitpos = np.isin(h, miss)
            if hitpos.any():
                pos = t["_pos"].to_numpy()[hitpos]
                hs = h[hitpos]
                out_h.extend(int(x) for x in hs)
                out_f.extend([meta.fragment_id] * len(hs))
                out_p.extend(int(p) for p in pos)
        return pa.table({"hash": pa.array(out_h, pa.int64()),
                         "frag": pa.array(out_f, pa.string()),
                         "pos": pa.array(out_p, pa.int64())})


def _merge_fullrow(root: str, cdc_paths: list[str], *, run_id: str,
                   num_buckets: int | None = None,
                   cleanup: str = "inline") -> Snapshot:
    """MERGE for FullRow-identity tables (REPLICA IDENTITY FULL): ops
    carry whole rows; identity = 64-bit row hash; duplicates allowed;
    each fall-through delete kills EXACTLY ONE base instance, chosen
    deterministically as the earliest (fragment_id, pos).

    Scale notes: the fold shuffles only CDC rows (bucketed by row
    hash); delete matching first probes each fragment's manifest
    key-hash filter (``keyfilter`` module — the analog of moonlink's
    persisted bucket hash index, ``persisted_bucket_hash_map.rs:
    25-310``, which is exactly what lets its FullRow deletes touch only
    matching files) and reads the stored _rowhash column of ONLY the
    fragments that can match — zone maps can't prune a hash identity,
    the filter can; the fall-through set and its candidate positions
    are O(unmatched deletes) — broadcast via ray.put and assigned
    vectorized on the driver (bounded by the CDC's delete count, NOT
    by table size)."""
    import ray
    import ray.data as rd

    t0 = time.perf_counter()
    snap = load(root)
    floor_lsn = snap.max_lsn
    done = read_lineage(root, run_id)
    aborted = _aborted_xids(cdc_paths)

    params = done.get("params")
    if params:
        B = int(params["num_buckets"])
    else:
        import pyarrow.parquet as pq
        n_rows = sum(pq.read_metadata(p).num_rows for p in cdc_paths)
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        B = num_buckets or int(np.clip(max(n_rows // 500, 4 * n_cpus),
                                       1, 4096))
        write_lineage(root, run_id, "params",
                      {"kind": "merge-params", "num_buckets": B,
                       "mode": "fullrow"})

    done_buckets = {rec["bucket"] for k, rec in done.items()
                    if k.startswith("bucket-")}
    new_metas: list[FragmentMeta] = []
    cdc_max_lsn = floor_lsn
    for k, rec in done.items():
        if k.startswith("bucket-"):
            new_metas.extend(FragmentMeta.from_dict(d)
                             for d in rec["fragments"])
            cdc_max_lsn = max(cdc_max_lsn, int(rec["max_lsn"]))

    def prep(batch: pa.Table) -> pa.Table:
        from ..stages.keys import row_hash
        batch = _strip_aborted(batch, aborted)
        batch = batch.filter(
            pc.greater(batch["_lsn"], pa.scalar(floor_lsn, pa.int64())))
        if batch.num_rows == 0:
            batch = batch.append_column("_rhash", pa.array([], pa.int64()))
            return batch.append_column("_bucket", pa.array([], pa.int64()))
        rh = row_hash(batch)
        b = (rh.view(np.uint64) % np.uint64(B)).astype(np.int64)
        batch = batch.append_column("_rhash", pa.array(rh, pa.int64()))
        batch = batch.append_column("_bucket", pa.array(b, pa.int64()))
        if done_buckets:
            batch = batch.filter(pa.array(~np.isin(b, list(done_buckets))))
        return batch

    folded = rd.read_parquet(cdc_paths) \
        .map_batches(prep, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(
            _BucketMergeFullrow(root, run_id, snap.schema),
            batch_format="pyarrow").take_all()
    any_fresh = bool(folded) or bool(done_buckets)
    if not any_fresh:
        return snap  # duplicate replay -> no-op
    for r in folded:
        if r["kind"] == 0:
            new_metas.append(FragmentMeta.from_dict(json.loads(r["meta"])))
        else:
            cdc_max_lsn = max(cdc_max_lsn, int(r["max_lsn"]))
    # miss counts from ALL bucket lineage (including this run's)
    misses: dict[int, int] = {}
    for k, rec in read_lineage(root, run_id).items():
        if k.startswith("bucket-"):
            for h, c in rec.get("misses", {}).items():
                misses[int(h)] = misses.get(int(h), 0) + int(c)

    # delete-exactly-N: prune fragments through their manifest key-hash
    # filters (the persisted_bucket_hash_map.rs probe analog — a
    # fragment whose filter rejects every fall-through hash is NEVER
    # opened), gather candidate (hash, frag, pos) rows from the
    # survivors, assign the earliest N per hash, write DVs
    dv_metas: dict[str, FragmentMeta] = {}
    n_probed = n_pruned = 0
    if misses:
        from .. import keyfilter as kf
        miss_arr = np.array(sorted(misses), dtype=np.int64)
        probe_frags: list[FragmentMeta] = []
        for f in snap.fragments:
            if f.rows <= 0:
                continue
            if f.keyfilter is not None and \
                    not kf.might_contain(f.keyfilter, miss_arr).any():
                n_pruned += 1  # definite miss: no read dispatched
                continue
            probe_frags.append(f)
        n_probed = len(probe_frags)
        write_lineage(root, run_id, "fullrow-probe", {
            "kind": "merge-fullrow-probe", "pruned": n_pruned,
            "probed": sorted(f.fragment_id for f in probe_frags)})
        cands = []
        if probe_frags:
            miss_ref = ray.put(miss_arr)
            items = [{"meta": json.dumps(asdict(f))} for f in probe_frags]
            cands = rd.from_items(items,
                                  override_num_blocks=len(items)) \
                .map_batches(_FullrowCandidates(root, miss_ref),
                             batch_size=1,
                             batch_format="pyarrow").take_all()
        kills: dict[str, list[int]] = {}
        if cands:
            # vectorized earliest-quota[h] assignment per hash (order
            # (hash, frag, pos), rank within hash group < quota) — the
            # per-candidate work stays in numpy; state is O(candidates),
            # bounded by unmatched deletes x duplicate count
            hashes = np.array([r["hash"] for r in cands], dtype=np.int64)
            frag_ids, finv = np.unique(
                np.array([r["frag"] for r in cands], dtype=object),
                return_inverse=True)
            poss = np.array([r["pos"] for r in cands], dtype=np.int64)
            order = np.lexsort((poss, finv, hashes))
            h_o, f_o, p_o = hashes[order], finv[order], poss[order]
            grp = np.flatnonzero(np.r_[True, h_o[1:] != h_o[:-1]])
            lens = np.diff(np.r_[grp, len(h_o)])
            rank = np.arange(len(h_o)) - np.repeat(grp, lens)
            quota = np.array([misses[int(h)] for h in h_o[grp]],
                             dtype=np.int64)
            keep = rank < np.repeat(quota, lens)
            # group kept kills per fragment without a per-row loop
            fk, pk = f_o[keep], p_o[keep]
            ord2 = np.argsort(fk, kind="stable")
            fk, pk = fk[ord2], pk[ord2]
            starts = np.flatnonzero(np.r_[True, fk[1:] != fk[:-1]])
            for s, e in zip(starts, np.r_[starts[1:], len(fk)]):
                kills[str(frag_ids[fk[s]])] = pk[s:e].tolist()
        by_id = snap.frag_by_id()
        if len(kills) >= _RAY_DV_THRESHOLD:
            # many touched fragments: DV writes fan out as a Ray pass
            # (each task unions the old DV and writes the sidecar) —
            # the driver never serializes per-fragment filesystem IO
            items = [{"meta": json.dumps(asdict(by_id[fid])),
                      "dead": dead} for fid, dead in kills.items()]
            written = rd.from_items(items,
                                    override_num_blocks=len(items)) \
                .map_batches(_FullrowDVWrite(root, run_id), batch_size=1,
                             batch_format="pyarrow").take_all()
            for r in written:
                m = FragmentMeta.from_dict(json.loads(r["meta"]))
                dv_metas[m.fragment_id] = m
        else:
            for frag_id, dead in kills.items():
                meta = by_id[frag_id]
                new_dead = np.asarray(dead, dtype=np.int64)
                if meta.dv:
                    from ..fragments import read_dv
                    new_dead = np.union1d(new_dead, read_dv(root, meta.dv))
                dv_ref = write_dv(root, f"dv-{run_id}-{frag_id}", new_dead)
                dv_metas[frag_id] = FragmentMeta(**{**asdict(meta),
                                                    "dv": dv_ref})

    final: list[FragmentMeta] = []
    for f in snap.fragments:
        m = dv_metas.get(f.fragment_id, f)
        if m.live_rows > 0:
            final.append(m)
    final.extend(m for m in new_metas if m.rows > 0)
    final.sort(key=lambda m: m.fragment_id)
    out = commit(root, final, max_lsn=max(cdc_max_lsn, floor_lsn),
                 job={"kind": "merge", "run_id": run_id, "mode": "fullrow",
                      "cdc_paths": sorted(cdc_paths), "num_buckets": B,
                      "metrics": {
                          "wall_sec": round(time.perf_counter() - t0, 3),
                          "fullrow_fallthrough": int(sum(misses.values())),
                          "fullrow_probed": n_probed,
                          "fullrow_pruned": n_pruned,
                          "dv_fragments": len(dv_metas)}},
                 expected_parent=snap.version)
    if cleanup != "defer":
        for_root(root).retire_dir(f"tmp/merge-{run_id}")
    return out


# -------------------------------------------- streaming-transaction abort

def _aborted_xids(cdc_paths: list[str]):
    """Streaming-transaction abort support — the batch analog of
    moonlink's per-xact buffering with abort
    (``/root/reference/src/moonlink/src/storage/mooncake_table/
    transaction_stream.rs:17-41`` and the ``StreamAbort`` WAL event,
    ``storage/wal.rs:78-100``): CDC rows may carry an ``_xid`` column;
    a marker row with ``_op == "abort"`` discards EVERY op of that
    transaction in the batch (the xact never committed upstream).

    Returns a sorted int64 xid array, or None when the CDC carries no
    ``_xid`` column (the common non-streaming case — zero cost).
    Driver state is O(#aborted transactions)."""
    import pyarrow.parquet as pq

    if not any("_xid" in pq.read_schema(p).names for p in cdc_paths):
        return None
    import ray.data as rd

    ds = rd.read_parquet(cdc_paths, columns=["_xid", "_op"])

    def partial(b: pa.Table) -> pa.Table:
        x = pc.unique(b.filter(pc.equal(b["_op"], pa.scalar("abort")))["_xid"])
        return pa.table({"xid": x.cast(pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return np.unique(np.array([r["xid"] for r in rows], dtype=np.int64))


def _strip_aborted(batch: pa.Table, aborted) -> pa.Table:
    """Drop ops of aborted transactions plus commit/abort marker rows
    (markers are control rows, never data — a commit marker in a direct
    merge batch is a no-op since the batch is applied atomically anyway;
    marker-driven cross-file visibility is pipelines/xact.py's job)."""
    if aborted is None:
        return batch
    keep = ~np.isin(batch["_op"].to_numpy(zero_copy_only=False),
                    ("abort", "commit"))
    if "_xid" in batch.column_names and len(aborted):
        xid = batch["_xid"].to_numpy(zero_copy_only=False)
        keep &= ~np.isin(xid, aborted)
    return batch.filter(pa.array(keep))


# -------------------------------------------------- tombstone shard pass

def _tomb_dir(run_id: str) -> str:
    return f"tmp/merge-{run_id}/tomb"


def _shard_cuts(snap: Snapshot, key0: str,
                max_shards: int = _MAX_TOMB_SHARDS) -> list:
    """Range-shard boundaries for the tombstone key set, derived from
    the base fragments' zone-map minima on the first key column (pure
    manifest metadata — no data read). Shard i holds first-column
    values in [cuts[i-1], cuts[i]); the resulting shards align with the
    fragment layout, so a DV task's fragment overlaps few shards."""
    mins = sorted({f.stats[key0][0] for f in snap.fragments
                   if f.stats.get(key0) and f.rows > 0})
    if len(mins) <= 1:
        return []
    step = max(1, -(-len(mins) // max_shards))  # ceil
    return mins[step::step]


class _TombstoneShardWriter:
    """map_batches task over the column-pruned CDC read: drop stale ops,
    compute the batch's aggregates, and append ONE spill file with a
    shard-aligned row group per range shard it touches (same layout as
    the cluster exchange's spill). Returns summary rows; only files
    reported by the completed run are ever read back, so a retried
    task's orphan files are inert."""

    _SUMMARY = pa.schema([
        ("kind", pa.int8()),      # 0 = shard row group, 1 = aggregates
        ("shard", pa.int64()),
        ("file", pa.string()),
        ("rg", pa.int64()),
        ("count", pa.int64()),
        ("k0_min", pa.string()),
        ("k0_max", pa.string()),
        ("n_fresh", pa.int64()),
        ("max_lsn", pa.int64()),
    ])

    def __init__(self, root: str, run_id: str, cuts: list,
                 key_columns: tuple, floor_lsn: int, aborted=None):
        self.root = root
        self.run_id = run_id
        self.cuts = list(cuts)
        self.key_columns = tuple(key_columns)
        self.floor = floor_lsn
        self.aborted = aborted
        self.__name__ = "TombstoneShardWriter"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        batch = _strip_aborted(batch, self.aborted)
        fresh = batch.filter(
            pc.greater(batch["_lsn"], pa.scalar(self.floor, pa.int64())))
        n_fresh = fresh.num_rows
        max_lsn = (int(pc.max(fresh["_lsn"]).as_py()) if n_fresh
                   else self.floor)
        rows = {name: [] for name in self._SUMMARY.names}

        def emit(kind, shard=-1, file="", rg=-1, count=0,
                 k0_min="", k0_max="", nf=0, ml=None):
            rows["kind"].append(kind)
            rows["shard"].append(shard)
            rows["file"].append(file)
            rows["rg"].append(rg)
            rows["count"].append(count)
            rows["k0_min"].append(k0_min)
            rows["k0_max"].append(k0_max)
            rows["n_fresh"].append(nf)
            rows["max_lsn"].append(self.floor if ml is None else ml)

        emit(1, nf=n_fresh, ml=max_lsn)
        tomb = fresh.filter(pc.not_equal(fresh["_op"], pa.scalar("insert")))
        if tomb.num_rows:
            keys = canonical_keys(tomb, list(self.key_columns))
            k0 = tomb[self.key_columns[0]].to_numpy(zero_copy_only=False)
            keys, first_idx = np.unique(keys, return_index=True)
            k0 = k0[first_idx]
            shard = (np.searchsorted(self.cuts, k0, side="right")
                     if self.cuts else np.zeros(len(k0), dtype=np.int64))
            order = np.argsort(shard, kind="stable")
            keys, k0, shard = keys[order], k0[order], shard[order]
            bounds = np.flatnonzero(np.diff(shard)) + 1
            starts = np.concatenate([[0], bounds])
            stops = np.concatenate([bounds, [len(shard)]])
            fs = for_root(self.root)
            d = _tomb_dir(self.run_id)
            fs.makedirs(d)
            rel = f"{uuid.uuid4().hex[:12]}.parquet"
            full = fs.full(f"{d}/{rel}")
            schema = pa.schema([("key", pa.string())])
            from ..runtime import page_write_throttle
            with page_write_throttle():
                writer = pq.ParquetWriter(full + ".tmp", schema,
                                          compression="snappy",
                                          filesystem=fs.fs)
                try:
                    for rg, (s, e) in enumerate(zip(starts, stops)):
                        ks = np.sort(keys[s:e])  # canonical order per shard
                        writer.write_table(
                            pa.table({"key": pa.array(ks, pa.string())},
                                     schema=schema),
                            row_group_size=e - s)
                        emit(0, shard=int(shard[s]), file=rel, rg=rg,
                             count=int(e - s), k0_min=str(min(k0[s:e])),
                             k0_max=str(max(k0[s:e])))
                finally:
                    writer.close()
            fs.fs.move(full + ".tmp", full)
        return pa.table(
            {k: pa.array(v, self._SUMMARY.field(k).type)
             for k, v in rows.items()}, schema=self._SUMMARY)


def _tombstone_pass(root: str, run_id: str, snap: Snapshot,
                    cdc_paths: list[str], key_columns: tuple,
                    floor_lsn: int, done: dict, cdc_ds=None,
                    aborted=None) -> dict:
    """Run (or resume) the tombstone shard pass; returns the lineage
    record {files: {shard: [[file, rg], ...]}, ranges: {shard: [lo, hi]},
    n_fresh, max_lsn, tombstones}. ``cdc_ds`` (a pre-built column-pruned
    Dataset over the CDC paths) lets the caller construct all datasets
    on one thread (see merge: read_parquet construction is not
    thread-safe against a concurrent read_parquet)."""
    import ray.data as rd

    rec = done.get("tombstones")
    if rec:
        return rec
    key0 = key_columns[0]
    cuts = _shard_cuts(snap, key0)
    cdc = cdc_ds if cdc_ds is not None else rd.read_parquet(
        cdc_paths, columns=sorted(set(key_columns)) + ["_op", "_lsn"])
    summary = cdc.map_batches(
        _TombstoneShardWriter(root, run_id, cuts, key_columns, floor_lsn,
                              aborted),
        batch_format="pyarrow").take_all()
    files: dict[str, list] = {}
    ranges: dict[str, list] = {}
    n_fresh = 0
    max_lsn = floor_lsn
    tomb_rows = 0
    for r in summary:
        if r["kind"] == 1:
            n_fresh += int(r["n_fresh"])
            max_lsn = max(max_lsn, int(r["max_lsn"]))
            continue
        s = str(int(r["shard"]))
        files.setdefault(s, []).append([r["file"], int(r["rg"])])
        tomb_rows += int(r["count"])
        rng = ranges.get(s)
        if rng is None:
            ranges[s] = [r["k0_min"], r["k0_max"]]
        else:
            rng[0] = min(rng[0], r["k0_min"])
            rng[1] = max(rng[1], r["k0_max"])
    rec = {"kind": "merge-tombstones", "files": {k: sorted(v)
                                                 for k, v in files.items()},
           "ranges": ranges, "n_fresh": n_fresh, "max_lsn": max_lsn,
           "tombstones": tomb_rows}
    write_lineage(root, run_id, "tombstones", rec)
    return rec


class _DVUpdate:
    """map_batches callable over affected-fragment metas (batch_size=1):
    read only the key columns, match the overlapping tombstone shards,
    write a new cumulative DV (or keep the meta untouched on no hits)."""

    def __init__(self, root: str, run_id: str, files_ref,
                 key_columns: tuple):
        self.root = root
        self.run_id = run_id
        self.files_ref = files_ref
        self.key_columns = tuple(key_columns)
        self._files = None   # {shard: [[file, rg], ...]}, fetched once
        self._rg_cache: dict = {}

    def _shard_files(self) -> dict:
        if self._files is None:
            import ray
            self._files = (ray.get(self.files_ref)
                           if hasattr(self.files_ref, "hex")
                           else self.files_ref)
        return self._files

    def _keys_for(self, shards: list[str]) -> np.ndarray:
        import pyarrow.parquet as pq
        fs = for_root(self.root)
        d = _tomb_dir(self.run_id)
        files = self._shard_files()
        parts = []
        for s in shards:
            for f, rg in files.get(str(s), []):
                ck = (f, rg)
                if ck not in self._rg_cache:
                    pf = pq.ParquetFile(fs.full(f"{d}/{f}"), filesystem=fs.fs)
                    self._rg_cache[ck] = pf.read_row_group(
                        rg, columns=["key"])["key"].to_numpy(
                            zero_copy_only=False)
                parts.append(self._rg_cache[ck])
        if not parts:
            return np.empty(0, dtype=object)
        return np.unique(np.concatenate(parts))

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            tp = time.perf_counter()
            meta = FragmentMeta.from_dict(json.loads(row["meta"]))
            keys = self._keys_for(json.loads(row["shards"]))
            new_meta = meta
            if len(keys):
                t = read_fragment(self.root, meta,
                                  columns=list(self.key_columns),
                                  with_pos=True, apply_dv=False)
                ids = canonical_keys(t, list(self.key_columns))
                hit = keys[np.searchsorted(keys, ids, side="left")
                           .clip(0, len(keys) - 1)] == ids
                if hit.any():
                    new_dead = t["_pos"].to_numpy()[hit]
                    if meta.dv:
                        from ..fragments import read_dv
                        new_dead = np.union1d(new_dead,
                                              read_dv(self.root, meta.dv))
                    dv_ref = write_dv(
                        self.root, f"dv-{self.run_id}-{meta.fragment_id}",
                        new_dead)
                    new_meta = FragmentMeta(**{**asdict(meta), "dv": dv_ref})
            write_lineage(self.root, self.run_id, f"dv-{meta.fragment_id}", {
                "kind": "merge-dv", "fragment_id": meta.fragment_id,
                "meta": asdict(new_meta),
                "wall_sec": round(time.perf_counter() - tp, 3),
            })
            out.append(json.dumps(asdict(new_meta)))
        return pa.table({"meta": pa.array(out, pa.string())})


def _affected_fragments(snap: Snapshot, ranges: dict, key0: str
                        ) -> list[tuple[FragmentMeta, list[str]]]:
    """Zone-map prune: (fragment, overlapping nonempty shard ids) for
    every fragment whose first-key-column range intersects at least one
    tombstone shard's [min, max]."""
    out = []
    for f in snap.fragments:
        rng = f.stats.get(key0)
        if not rng or f.rows == 0:
            continue
        shards = [s for s, (lo, hi) in ranges.items()
                  if not (hi < rng[0] or lo > rng[1])]
        if shards:
            out.append((f, sorted(shards)))
    return out


def merge(root: str, cdc_paths: list[str] | str, *, run_id: str | None = None,
          num_buckets: int | None = None,
          key_columns: list[str] | None = None,
          cleanup: str = "inline") -> Snapshot:
    """Run MERGE INTO and commit a new snapshot; returns it.

    Idempotent: if every CDC op has lsn <= the table's max_lsn the call
    is a no-op returning the current snapshot. ``key_columns`` defaults
    to the table config's ``identity.key_columns``.

    ``cleanup="defer"`` leaves the run's tmp/ scratch (tombstone shards)
    for expire's orphan GC instead of deleting it inline — the async
    scratch-GC pattern: bulk frees right after a commit contend with
    the next job's page allocations (on this sandbox's host they
    measurably poison the fault path; on a real cluster they compete
    for the same file-system metadata path).
    """
    import ray
    import ray.data as rd

    if isinstance(cdc_paths, str):
        cdc_paths = [cdc_paths]
    run_id = run_id or uuid.uuid4().hex[:12]
    t0 = time.perf_counter()
    snap = load(root)
    floor_lsn = snap.max_lsn
    if key_columns is None:
        from ..table_config import load_table_config
        ident = load_table_config(root).identity
        if ident.mode == "fullrow":
            return _merge_fullrow(root, cdc_paths, run_id=run_id,
                                  num_buckets=num_buckets, cleanup=cleanup)
        key_columns = list(ident.key_columns)
    key_columns = tuple(key_columns)

    done = read_lineage(root, run_id)

    # -- bucket count: scales with BOTH the CDC size (bounded fold state
    # per bucket) and the cluster width (a 4N cluster folds 4x as wide).
    # Sized from parquet METADATA row counts (footer-only driver read —
    # no key materialization). Pinned in a run-level lineage record on
    # the FIRST invocation: a resume after a kill may see a different
    # cluster width, and a recomputed B would silently re-partition keys
    # across buckets, dropping/duplicating CDC rows against the
    # done-bucket checkpoints.
    params = done.get("params")
    if params:
        B = int(params["num_buckets"])
        if num_buckets is not None and num_buckets != B:
            raise ValueError(
                f"resume of run {run_id} pinned num_buckets={B}, "
                f"got {num_buckets}")
    else:
        import pyarrow.parquet as pq
        n_rows = sum(pq.read_metadata(p).num_rows for p in cdc_paths)
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        # 4x CPU width floor: with B ~= CPUs one wave of buckets makes
        # the wall clock the slowest bucket (skew-bound); 4x keeps the
        # tail short while fold state per bucket stays bounded
        B = num_buckets or int(np.clip(max(n_rows // 500, 4 * n_cpus), 1, 4096))
        write_lineage(root, run_id, "params",
                      {"kind": "merge-params", "num_buckets": B})

    # streaming-transaction aborts (only when the CDC carries _xid):
    # collect the aborted xid set once, before anything consumes ops
    aborted = _aborted_xids(cdc_paths)

    # both CDC Datasets are CONSTRUCTED here on the main thread:
    # read_parquet construction races a lazy fsspec import inside Ray's
    # path resolution when two threads build readers concurrently
    # (observed: ImportError from a partially-imported module). The
    # threads below only attach stages and execute, which is safe.
    tomb_cols = sorted(set(key_columns)) + ["_op", "_lsn"]
    if aborted is not None:
        tomb_cols.append("_xid")
    tomb_ds = (None if done.get("tombstones")
               else rd.read_parquet(cdc_paths, columns=tomb_cols))
    # the fold never reads payload: adoption spans + a key-column
    # positional read (see _cdc_spans/_SpanKeyReader/_AdoptSpan)
    spans = _cdc_spans(cdc_paths)
    span_items = [{"span": s["span"], "path": s["path"], "rg0": s["rg0"],
                   "rg1": s["rg1"]} for s in spans]
    fold_ds = rd.from_items(span_items, override_num_blocks=len(span_items))

    # -- stage 0+1 (one thread): tombstone shard pass (distributed,
    # column-pruned; also yields the CDC aggregates, so the driver never
    # reads the CDC) -> DV updates on the affected base fragments
    stage_sec: dict[str, float] = {}
    dv_metas: dict[str, FragmentMeta] = {}

    def run_tomb_and_dv_stage() -> tuple[dict, list]:
        tp = time.perf_counter()
        tomb_rec = _tombstone_pass(root, run_id, snap, cdc_paths,
                                   key_columns, floor_lsn, done,
                                   cdc_ds=tomb_ds, aborted=aborted)
        stage_sec["tombstone_sec"] = round(time.perf_counter() - tp, 3)
        if int(tomb_rec["n_fresh"]) == 0:
            return tomb_rec, []
        affected = _affected_fragments(snap, tomb_rec["ranges"],
                                       key_columns[0])
        todo = []
        for f, shards in affected:
            rec = done.get(f"dv-{f.fragment_id}")
            if rec:
                dv_metas[f.fragment_id] = FragmentMeta.from_dict(rec["meta"])
            else:
                todo.append((f, shards))
        if not todo:
            return tomb_rec, []
        tp = time.perf_counter()
        files_ref = ray.put(tomb_rec["files"])  # broadcast once, O(shards)
        # bundle several fragments per task, grouped by first overlapping
        # shard: one-fragment tasks (the bench fixture has ~470 64-row
        # fragments) are dominated by dispatch + re-reading the same
        # tombstone row groups — _DVUpdate's _rg_cache only pays off
        # when fragments sharing shards ride the same task. Bundling
        # measured dv_sec 2.25->0.74 s @32 / 3.44->1.63 s @8 on the
        # bench table; >= ~2 waves per slot keeps the tail balanced.
        todo.sort(key=lambda t: (t[1][0] if t[1] else "", t[0].fragment_id))
        items = [{"meta": json.dumps(asdict(f)), "shards": json.dumps(shards)}
                 for f, shards in todo]
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        bundle = max(1, min(8, len(items) // max(1, 2 * n_cpus)))
        ds = rd.from_items(items,
                           override_num_blocks=max(1, len(items) // bundle))
        out = ds.map_batches(_DVUpdate(root, run_id, files_ref, key_columns),
                             batch_size=bundle,
                             batch_format="pyarrow").take_all()
        stage_sec["dv_sec"] = round(time.perf_counter() - tp, 3)
        return tomb_rec, out

    # -- stage 2: positional fold of the CDC's key/op rows -> adopted
    # span fragments. The exchange carries only (key, op, lsn, seq,
    # span, row) — payload bytes NEVER move: survivors stay in the CDC
    # file, which is adopted (hardlink/copy) as span fragments with a
    # DV over the non-surviving rows. Write amplification: O(keys), not
    # O(CDC bytes).
    done_spans: set[int] = set()
    new_metas: list[FragmentMeta] = []
    for k, rec in done.items():
        if k.startswith("adopt-"):
            done_spans.add(int(rec["span"]))
            new_metas.extend(FragmentMeta.from_dict(d)
                             for d in rec["fragments"])

    fold_cols = sorted(set(key_columns)) + ["_op", "_lsn", "_seq"]
    if aborted is not None:
        fold_cols.append("_xid")

    def prep(batch: pa.Table) -> pa.Table:
        batch = _strip_aborted(batch, aborted)
        batch = batch.filter(pc.greater(batch["_lsn"], pa.scalar(floor_lsn, pa.int64())))
        if batch.num_rows == 0:
            return batch.append_column("_bucket", pa.array([], pa.int64()))
        b = bucket_of(canonical_keys(batch, list(key_columns)), B)
        return batch.append_column("_bucket", pa.array(b, pa.int64()))

    def run_fold_stage() -> list:
        tp = time.perf_counter()
        cdc = fold_ds.map_batches(_SpanKeyReader(fold_cols), batch_size=1,
                                  batch_format="pyarrow") \
                     .map_batches(prep, batch_format="pyarrow")
        survivors = cdc.groupby("_bucket").map_groups(
            _FoldPositions(key_columns), batch_format="pyarrow")
        spans_ref = ray.put(spans)  # O(spans) broadcast, read once/task
        adopted = survivors.groupby("_span").map_groups(
            _AdoptSpan(root, run_id, spans_ref, done_spans, key_columns),
            batch_format="pyarrow")
        out = adopted.take_all()
        stage_sec["fold_sec"] = round(time.perf_counter() - tp, 3)
        return out

    # the tombstone->DV chain and the fold are independent until the
    # commit (the DV side touches only base fragments, the fold only CDC
    # rows) — run their Ray pipelines concurrently so neither's fixed
    # latency serializes: wall = max(tombstone+dv, fold)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as ex:
        dv_fut = ex.submit(run_tomb_and_dv_stage)
        fold_fut = ex.submit(run_fold_stage)
        tomb_rec, dv_rows = dv_fut.result()
        fold_rows = fold_fut.result()
    n_ops = int(tomb_rec["n_fresh"])
    if n_ops == 0:
        # duplicate replay -> no-op (the concurrent fold saw only stale
        # LSNs, so it wrote nothing either)
        for_root(root).retire_dir(f"tmp/merge-{run_id}")
        return snap
    cdc_max_lsn = int(tomb_rec["max_lsn"])
    for r in dv_rows:
        m = FragmentMeta.from_dict(json.loads(r["meta"]))
        dv_metas[m.fragment_id] = m
    for r in fold_rows:
        new_metas.append(FragmentMeta.from_dict(json.loads(r["meta"])))

    # -- commit
    final: list[FragmentMeta] = []
    for f in snap.fragments:
        m = dv_metas.get(f.fragment_id, f)
        if m.live_rows > 0:
            final.append(m)
    final.extend(m for m in new_metas if m.rows > 0)
    final.sort(key=lambda m: m.fragment_id)
    out = commit(root, final, max_lsn=max(cdc_max_lsn, floor_lsn),
                 job={"kind": "merge", "run_id": run_id,
                      "cdc_paths": sorted(cdc_paths), "num_buckets": B,
                      "key_columns": list(key_columns),
                      "metrics": {"wall_sec": round(time.perf_counter() - t0, 3),
                                  "cdc_ops": n_ops,
                                  "tombstones": int(tomb_rec["tombstones"]),
                                  "dv_fragments": len(dv_metas),
                                  **stage_sec}},
                 expected_parent=snap.version)
    if cleanup != "defer":
        for_root(root).retire_dir(f"tmp/merge-{run_id}")
    return out
