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
