"""Stable, vectorized key hashing and Z-order key derivation.

Moonlink hashes row identity with splitmix64/AHash
(``/root/reference/src/moonlink/src/storage/index/
persisted_bucket_hash_map.rs:25-31``, ``row/moonlink_row.rs:333-349``).
We need the same property — a hash stable across processes and runs
(Python's ``hash()`` is salted per process) — but vectorized over Arrow
string columns; ``pandas.util.hash_array`` (fixed default hash key)
provides it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_strings(arr) -> np.ndarray:
    """uint64 stable hash of a string column (pa.Array / ChunkedArray / ndarray)."""
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = arr.to_numpy(zero_copy_only=False)
    return pd.util.hash_array(np.asarray(arr, dtype=object))


def bucket_of(keys, num_buckets: int) -> np.ndarray:
    return (stable_hash_strings(keys) % np.uint64(num_buckets)).astype(np.int64)


# \x1f (ASCII unit separator) joins composite key columns; key values may
# not contain it (same class of reserved-byte contract as moonlink's
# AHash over the typed column values, which has no collision-free string
# form at all).
KEY_SEP = "\x1f"


def canonical_key_column(table: pa.Table, key_columns: list[str]):
    """Canonical identity key per row as an Arrow string array (no
    Python-object materialization; see canonical_keys)."""
    import pyarrow.compute as pc

    if len(key_columns) == 1:
        col = table[key_columns[0]]
    else:
        arrs = [pc.cast(table[c], pa.string()) for c in key_columns]
        col = pc.binary_join_element_wise(*arrs, KEY_SEP)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col


def row_hash(table: pa.Table, columns: list[str] | None = None) -> np.ndarray:
    """Stable 64-bit full-row identity hash (int64) — the FullRow
    identity mode's key (``/root/reference/src/moonlink/src/row/
    moonlink_row.rs:343-349``: AHash over every value; duplicates
    allowed, identity is the whole row). Hashes the non-internal
    columns (names not starting with ``_``) in table order with an
    order-sensitive FNV-style combine; stable across processes
    (pandas' fixed default hash key). 64-bit hash equality IS the
    identity — same engineering tradeoff as the reference's hashed
    full-row index probe."""
    import pandas as pd

    if columns is None:
        columns = [c for c in table.column_names if not c.startswith("_")]
    h = np.zeros(table.num_rows, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for c in columns:
        ch = pd.util.hash_array(
            np.asarray(table[c].to_numpy(zero_copy_only=False)))
        h = (h * prime) ^ ch.astype(np.uint64)
    return h.view(np.int64)


def key_codes(table: pa.Table, key_columns: list[str]) -> np.ndarray:
    """Distinct int code per canonical key (Arrow dictionary encode —
    C-speed hash grouping, no object-array sort)."""
    import pyarrow.compute as pc

    col = canonical_key_column(table, key_columns)
    return pc.dictionary_encode(col).indices.to_numpy(zero_copy_only=False)


def canonical_keys(table: pa.Table, key_columns: list[str]) -> np.ndarray:
    """Canonical identity key per row (object ndarray of str).

    Single key column -> the raw column values; composite key -> the
    KEY_SEP-joined string casts of the key columns, the vectorized
    analog of ``IdentityProp::Keys`` identity hashing
    (``/root/reference/src/moonlink/src/row/moonlink_row.rs:336-342``).
    Lexicographic order of canonical keys is first-column-major, so
    zone-map pruning on the first key column stays sound.
    """
    import pyarrow.compute as pc

    if len(key_columns) == 1:
        return table[key_columns[0]].to_numpy(zero_copy_only=False)
    arrs = [pc.cast(table[c], pa.string()) for c in key_columns]
    joined = pc.binary_join_element_wise(*arrs, KEY_SEP)
    return joined.to_numpy(zero_copy_only=False)


# ------------------------------------------------------------- Z-order

def _spread_bits_u64(x: np.ndarray, stride: int, offset: int, nbits: int) -> np.ndarray:
    """Place bit i of x (0 = MSB of the nbits window) at output bit position
    (63 - offset - i*stride). Vectorized over uint64 arrays."""
    out = np.zeros_like(x, dtype=np.uint64)
    for i in range(nbits):
        bit = (x >> np.uint64(nbits - 1 - i)) & np.uint64(1)
        shift = 63 - offset - i * stride
        if shift < 0:
            break
        out |= bit << np.uint64(shift)
    return out


def zorder_key(phash, w, h) -> np.ndarray:
    """Interleave (phash: top 32 bits, w: 16 bits, h: 16 bits) into a u64
    Morton key, MSB-aligned, pattern [p w h p] repeating (phash gets 2 of
    every 4 bit positions — it carries the most locality signal).

    Returns int64 (order-preserving reinterpretation: we flip the sign
    bit so unsigned order == signed order).
    """
    ph = np.asarray(phash, dtype=np.int64).astype(np.uint64)
    wv = np.asarray(w, dtype=np.int64).astype(np.uint64) & np.uint64(0xFFFF)
    hv = np.asarray(h, dtype=np.int64).astype(np.uint64) & np.uint64(0xFFFF)
    ph32 = ph >> np.uint64(32)  # top 32 bits of the perceptual hash

    out = np.zeros_like(ph, dtype=np.uint64)
    # 4-bit groups: [p, w, h, p] -> phash stride 2 within its own lane
    out |= _spread_bits_u64(ph32, stride=2, offset=0, nbits=32)   # bits 63,61,59,...
    out |= _spread_bits_u64(wv, stride=4, offset=1, nbits=16)     # bits 62,58,...
    out |= _spread_bits_u64(hv, stride=4, offset=3, nbits=16)     # bits 60,56,...
    # flip sign bit: uint64 ascending == int64 ascending
    return (out ^ np.uint64(1 << 63)).astype(np.int64)


# ------------------------------------------------------------- Hilbert

_HBITS = 21  # 3 dims x 21 bits = 63 index bits


def _axes_to_transpose(X: list, bits: int) -> list:
    """Skilling's AxesToTranspose, vectorized over uint64 arrays.

    Public-domain algorithm from J. Skilling, "Programming the Hilbert
    curve", AIP Conf. Proc. 707, 381 (2004): converts d coordinates to
    the "transposed" Hilbert index in place; the index is then the bit
    interleave of the transposed words.
    """
    d = len(X)
    Q = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while Q > one:
        P = Q - one
        for i in range(d):
            hi = (X[i] & Q) != 0
            # invert low bits of X[0] where bit set ...
            X[0] = np.where(hi, X[0] ^ P, X[0])
            # ... else exchange low bits of X[0] and X[i]
            t = np.where(hi, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] ^= t
            X[i] ^= t
        Q >>= one
    for i in range(1, d):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        m = (X[d - 1] & Q) != 0
        t = np.where(m, t ^ (Q - one), t)
        Q >>= one
    for i in range(d):
        X[i] ^= t
    return X


def hilbert_key(phash, w, h) -> np.ndarray:
    """3-D Hilbert-curve key over (phash top 21 bits, w, h), as int64.

    Same contract as zorder_key (order-preserving int64, phash carries
    the dominant locality signal); the Hilbert curve trades Morton's
    cheap interleave for strictly better locality (every step moves to
    an adjacent cell, so a key range maps to at most two spatial spans
    per dimension).
    """
    ph = np.asarray(phash, dtype=np.int64).astype(np.uint64)
    wv = np.asarray(w, dtype=np.int64).astype(np.uint64) & np.uint64(0xFFFF)
    hv = np.asarray(h, dtype=np.int64).astype(np.uint64) & np.uint64(0xFFFF)
    X = [ph >> np.uint64(64 - _HBITS),           # top 21 bits
         wv << np.uint64(_HBITS - 16),           # MSB-align 16 -> 21
         hv << np.uint64(_HBITS - 16)]
    X = _axes_to_transpose(X, _HBITS)
    out = np.zeros_like(X[0])
    for b in range(_HBITS - 1, -1, -1):          # MSB first
        for i in range(3):
            bit = (X[i] >> np.uint64(b)) & np.uint64(1)
            out = (out << np.uint64(1)) | bit
    # 63 index bits -> non-negative int64 directly
    return out.astype(np.int64)


CURVE_KEYS = {"zorder": zorder_key, "hilbert": hilbert_key}
