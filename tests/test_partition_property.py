"""Partition-invariant properties of the write-path helpers: however a
table or CDC file is split, EVERY row lands in exactly one piece, in
order — losing or duplicating a row here would silently corrupt
fragments (chunker) or adopted spans (span planner)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from moonlink_ray.pipelines.merge import _cdc_spans, _chunk_by_bytes


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000),
                min_size=0, max_size=60),
       st.integers(min_value=1, max_value=20000))
def test_chunk_by_bytes_partitions_exactly(sizes, target):
    t = pa.table({
        "image_id": pa.array([f"img-{i}" for i in range(len(sizes))]),
        "bytes": pa.array([b"x" * s for s in sizes], pa.binary()),
    })
    chunks = _chunk_by_bytes(t, target)
    if t.num_rows == 0:
        assert chunks == []
        return
    # exact order-preserving partition
    assert pa.concat_tables(chunks).equals(t)
    assert all(c.num_rows > 0 for c in chunks)
    # size discipline: a chunk only exceeds target by its last row
    # (rows are atomic), and no chunk BUT the last stops early
    for c in chunks[:-1]:
        head = sum(len(b.as_py()) for b in c["bytes"][:-1])
        assert head < target


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=300),
                min_size=1, max_size=12),
       st.integers(min_value=1, max_value=10**6))
def test_cdc_spans_partition_row_groups_exactly(rg_sizes, target):
    import tempfile
    rows = int(sum(rg_sizes))
    t = pa.table({"image_id": pa.array([f"img-{i:06d}" for i in range(rows)]),
                  "bytes": pa.array([b"p" * 40] * rows, pa.binary())})
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cdc.parquet")
        w = pq.ParquetWriter(path, t.schema)
        off = 0
        for s in rg_sizes:
            w.write_table(t.slice(off, s), row_group_size=s)
            off += s
        w.close()
        spans = _cdc_spans([path], target_bytes=target)
    # spans cover the row groups exactly, contiguously, in order
    assert [s["rg0"] for s in spans][0] == 0
    assert spans[-1]["rg1"] == len(rg_sizes)
    for a, b in zip(spans, spans[1:]):
        assert b["rg0"] == a["rg1"]
    # row accounting: each span's row0 is the running sum, rows match
    run = 0
    for s in spans:
        assert s["row0"] == run
        assert s["rows"] == sum(rg_sizes[s["rg0"]:s["rg1"]])
        run += s["rows"]
    assert run == rows
    # byte discipline: a span exceeds the target only when it is a
    # single oversized row group (row groups are atomic)
    for s in spans:
        assert s["rg1"] - s["rg0"] == 1 or s["bytes"] <= target
