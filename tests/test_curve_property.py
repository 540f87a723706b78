"""Property proofs of the clustering key kernels (stages/keys.py) —
the north rule's Z-order/Hilbert curves.

- Hilbert, exhaustively at small size: over the FULL 8x8x8 grid
  (bits=3 per axis) the derived index is a permutation of 0..511 and
  walking the indices in order moves EXACTLY one unit step along one
  axis each time — the defining property of a Hilbert curve. This
  proves the vectorized Skilling transpose wholesale at that size.
- Hilbert, at production width (21 bits/axis): round-trip through
  Skilling's published inverse (TransposeToAxes, implemented here in
  the test only) — the kernel is a bijection on the packed coords.
- Z-order: distinct packed (phash32, w, h) -> distinct keys, and the
  key is monotone in each coordinate with the others fixed (what
  zone-map pruning on key ranges relies on).
"""

import itertools

import numpy as np
from hypothesis import given, settings, strategies as st

from moonlink_ray.stages.keys import (_HBITS, _axes_to_transpose,
                                      hilbert_key, zorder_key)


def _interleave(X, bits):
    """Transposed words -> Hilbert index (mirrors hilbert_key's loop)."""
    out = np.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(len(X)):
            out = (out << np.uint64(1)) | ((X[i] >> np.uint64(b))
                                           & np.uint64(1))
    return out


def _deinterleave(key, d, bits):
    """Hilbert index -> transposed words (inverse of _interleave)."""
    X = [np.zeros_like(key) for _ in range(d)]
    pos = d * bits
    for b in range(bits - 1, -1, -1):
        for i in range(d):
            pos -= 1
            X[i] |= ((key >> np.uint64(pos)) & np.uint64(1)) << np.uint64(b)
    return X


def _transpose_to_axes(X, bits):
    """Skilling's TransposeToAxes (the inverse of _axes_to_transpose),
    from the same public-domain paper (AIP Conf. Proc. 707, 381);
    test-only reference implementation."""
    d = len(X)
    one = np.uint64(1)
    t = X[d - 1] >> one
    for i in range(d - 1, 0, -1):
        X[i] ^= X[i - 1]
    X[0] ^= t
    Q = np.uint64(2)
    end = np.uint64(1) << np.uint64(bits)
    while Q != end:
        P = Q - one
        for i in range(d - 1, -1, -1):
            hi = (X[i] & Q) != 0
            X[0] = np.where(hi, X[0] ^ P, X[0])
            t = np.where(hi, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] ^= t
            X[i] ^= t
        Q <<= one
    return X


def test_hilbert_is_a_hilbert_curve_exhaustive_8x8x8():
    bits = 3
    grid = np.array(list(itertools.product(range(8), repeat=3)),
                    dtype=np.uint64)
    X = [grid[:, i].copy() for i in range(3)]
    keys = _interleave(_axes_to_transpose(X, bits), bits)
    # bijection onto 0..511
    assert sorted(int(k) for k in keys) == list(range(512))
    # unit-step adjacency along the curve
    order = np.argsort(keys)
    walk = grid[order].astype(np.int64)
    steps = np.abs(np.diff(walk, axis=0))
    assert (steps.sum(axis=1) == 1).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-2**63, max_value=2**63 - 1),   # phash
    st.integers(min_value=0, max_value=0xFFFF),           # w
    st.integers(min_value=0, max_value=0xFFFF),           # h
), min_size=1, max_size=50))
def test_hilbert_key_round_trips_through_skilling_inverse(rows):
    ph = np.array([r[0] for r in rows], dtype=np.int64)
    w = np.array([r[1] for r in rows], dtype=np.int64)
    h = np.array([r[2] for r in rows], dtype=np.int64)
    key = hilbert_key(ph, w, h).astype(np.uint64)
    X = _transpose_to_axes(_deinterleave(key, 3, _HBITS), _HBITS)
    np.testing.assert_array_equal(
        X[0], ph.astype(np.uint64) >> np.uint64(64 - _HBITS))
    np.testing.assert_array_equal(
        X[1], w.astype(np.uint64) << np.uint64(_HBITS - 16))
    np.testing.assert_array_equal(
        X[2], h.astype(np.uint64) << np.uint64(_HBITS - 16))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=0, max_value=0xFFFFFFFF),       # phash top-32
    st.integers(min_value=0, max_value=0xFFFF),
    st.integers(min_value=0, max_value=0xFFFF),
), min_size=2, max_size=50, unique=True))
def test_zorder_distinct_inputs_distinct_keys(rows):
    ph32 = np.array([r[0] for r in rows], dtype=np.uint64)
    ph = (ph32 << np.uint64(32)).astype(np.int64)   # low 32 bits unused
    w = np.array([r[1] for r in rows], dtype=np.int64)
    h = np.array([r[2] for r in rows], dtype=np.int64)
    keys = zorder_key(ph, w, h)
    assert len(set(int(k) for k in keys)) == len(rows)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=0xFFFF),
       st.integers(min_value=0, max_value=0xFFFF),
       st.lists(st.integers(min_value=0, max_value=0xFFFFFFFF),
                min_size=2, max_size=30, unique=True))
def test_zorder_monotone_per_coordinate(w, h, phs):
    """With w,h fixed, the key is strictly increasing in the phash-top-32
    coordinate (and symmetrically for w and h) — range predicates on the
    leading coordinate map to key ranges, which is what the zone maps
    prune by after clustering."""
    ph32 = np.sort(np.array(phs, dtype=np.uint64))
    ph = (ph32 << np.uint64(32)).astype(np.int64)
    n = len(ph32)
    keys = zorder_key(ph, np.full(n, w, np.int64), np.full(n, h, np.int64))
    # NB: elementwise compare, not np.diff — keys span the full int64
    # range and differences overflow
    assert (keys[1:] > keys[:-1]).all()
    ws = np.sort(np.array(phs, dtype=np.uint64) & np.uint64(0xFFFF))
    ws = np.unique(ws)
    if len(ws) >= 2:
        n = len(ws)
        keys = zorder_key(np.full(n, 0, np.int64), ws.astype(np.int64),
                          np.full(n, h, np.int64))
        assert (keys[1:] > keys[:-1]).all()
