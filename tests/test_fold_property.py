"""Property-based fuzz of merge._fold_bucket: the vectorized
reflected-walk fold (numpy prefix-sum math) must equal a literal
per-key FIFO version queue on EVERY interleaving — the exhaustive
analog of moonlink's CDC-ordering tests
(/root/reference/src/moonlink/src/storage/mooncake_table/
table_handler/tests.rs: insert/update/delete interleavings).

The simulator below IS the semantics: ops in (lsn, seq,
delete-before-add) order; insert appends a live version, delete pops
the earliest live version of its key (no-op on empty = the
fall-through miss), upsert pops then appends at one LSN.
"""

from collections import defaultdict, deque

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from moonlink_ray.pipelines.merge import _fold_bucket
from moonlink_ray.stages.keys import key_codes

KEYS = ["img-a", "img-b", "img-c", "img-d"]

op_st = st.tuples(
    st.sampled_from(KEYS),
    st.sampled_from(["insert", "upsert", "delete"]),
    st.integers(min_value=0, max_value=5),   # _lsn: tight range -> ties
    st.integers(min_value=0, max_value=3),   # _seq: tight range -> ties
)


def brute_force(rows):
    """Literal FIFO version-queue simulation. Returns (survivor row
    indices, misses per key)."""
    order = sorted(range(len(rows)), key=lambda i: (
        rows[i][2], rows[i][3], 0 if rows[i][1] == "delete" else 1))
    live: dict[str, deque] = defaultdict(deque)
    misses: dict[str, int] = defaultdict(int)
    for i in order:
        key, op = rows[i][0], rows[i][1]
        if op in ("delete", "upsert"):
            if live[key]:
                live[key].popleft()
            else:
                misses[key] += 1
        if op in ("insert", "upsert"):
            live[key].append(i)
    survivors = sorted(i for q in live.values() for i in q)
    return survivors, {k: c for k, c in misses.items() if c}


def to_table(rows):
    return pa.table({
        "image_id": pa.array([r[0] for r in rows], pa.string()),
        "_op": pa.array([r[1] for r in rows], pa.string()),
        "_lsn": pa.array([r[2] for r in rows], pa.int64()),
        "_seq": pa.array([r[3] for r in rows], pa.int64()),
    })


@settings(max_examples=300, deadline=None)
@given(st.lists(op_st, min_size=0, max_size=60))
def test_fold_equals_fifo_queue(rows):
    group = to_table(rows)
    survivors, max_lsn = _fold_bucket(group)
    want, _ = brute_force(rows)
    assert sorted(int(i) for i in survivors) == want
    if rows:
        assert max_lsn == max(r[2] for r in rows)


@settings(max_examples=300, deadline=None)
@given(st.lists(op_st, min_size=0, max_size=60))
def test_fold_miss_counts_equal_failed_pops(rows):
    """return_misses: per-key fall-through delete counts feed the
    base-table tombstone/DV pass (and FullRow's delete-exactly-N), so
    they must be exact, not approximate."""
    group = to_table(rows)
    survivors, _, miss_keys, miss_counts = _fold_bucket(
        group, return_misses=True)
    want_surv, want_miss = brute_force(rows)
    assert sorted(int(i) for i in survivors) == want_surv
    if rows:
        codes = key_codes(group, ["image_id"])
        code_of = {rows[i][0]: int(codes[i]) for i in range(len(rows))}
        got = {int(k): int(c) for k, c in zip(miss_keys, miss_counts)}
        assert got == {code_of[k]: c for k, c in want_miss.items()}
    else:
        assert len(miss_keys) == 0
