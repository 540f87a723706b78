"""Per-fragment key-hash membership filters (blocked bloom).

The batch analog of moonlink's persisted bucket hash index
(``/root/reference/src/moonlink/src/storage/index/
persisted_bucket_hash_map.rs:25-310``): a point-identity probe — the
FullRow fall-through delete, whose 64-bit row hash defeats min/max zone
maps by construction — consults a compact per-fragment filter stored in
the manifest (``FragmentMeta.keyfilter``) and dispatches a read task
ONLY to fragments that can match. Without it, every unmatched FullRow
delete fans a ``_rowhash``-column read over the whole table
(O(fragments) reads per merge); with it, the expected fan-out is
(matching fragments) + FPR x (table fragments).

Design points (all manifest-resident, so sized for 10^12-image tables):

- ~10 bits/key, k=6 probes => ~0.8% false-positive rate; a false
  positive costs one column-pruned fragment read, never correctness
  (the read-side hash match is exact);
- capped at 8 KiB of bits per fragment: a fragment holding more than
  ~6.5k keys keeps a filter with gracefully degrading FPR instead of
  bloating the manifest (fragments here target 64 MiB of payload, so
  typical image fragments hold far fewer rows);
- probes are double hashing off the splitmix64 finalizer (the same
  public mixer moonlink uses to spread keys over index buckets,
  ``persisted_bucket_hash_map.rs:25-31``) — position_i =
  (h + i * mix(h)|1) mod bits, everything vectorized over numpy
  uint64 (wrap-around multiply is the intended semantics).
"""

from __future__ import annotations

import base64

import numpy as np

_K = 6                 # probe bits per key
_BITS_PER_KEY = 10
_MAX_BITS = 1 << 16    # 8 KiB bit array cap per fragment


def _as_u64(hashes) -> np.ndarray:
    h = np.asarray(hashes)
    if h.dtype == np.int64:
        return h.view(np.uint64)
    return h.astype(np.uint64, copy=False)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele et al.)."""
    z = h.copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def build(hashes) -> dict | None:
    """Build a filter dict over 64-bit key hashes (None for no keys).
    The dict is JSON-serializable and lives in ``FragmentMeta.keyfilter``."""
    h = _as_u64(hashes)
    if h.size == 0:
        return None
    want = max(64, _BITS_PER_KEY * int(h.size))
    bits = min(_MAX_BITS, 1 << int(np.ceil(np.log2(want))))
    m = np.uint64(bits)
    arr = np.zeros(bits, dtype=bool)
    h2 = _mix(h) | np.uint64(1)
    for i in range(_K):
        arr[(h + np.uint64(i) * h2) % m] = True
    return {"kind": "bloom", "bits": bits, "k": _K,
            "b64": base64.b64encode(np.packbits(arr).tobytes()).decode()}


def might_contain(filt: dict, hashes) -> np.ndarray:
    """Vectorized membership probe: bool per hash (True = fragment may
    hold the key; False = definitely absent)."""
    h = _as_u64(hashes)
    if h.size == 0:
        return np.zeros(0, dtype=bool)
    bits = int(filt["bits"])
    arr = np.unpackbits(np.frombuffer(base64.b64decode(filt["b64"]),
                                      dtype=np.uint8))[:bits].astype(bool)
    m = np.uint64(bits)
    h2 = _mix(h) | np.uint64(1)
    ok = np.ones(h.size, dtype=bool)
    for i in range(int(filt["k"])):
        ok &= arr[(h + np.uint64(i) * h2) % m]
    return ok
