"""Deterministic image codec ("MLI1").

The sandbox has no PIL/libjpeg, so this module implements a small, fully
deterministic codec with *real* lossless and lossy modes so that the
north-rule per-row invariant (decoded-pixel PSNR >= 40 dB for lossy
re-encode, exact bytes for lossless, caption equality) is genuinely
measurable rather than stubbed:

- container: ``MLI1`` magic + mode byte + u16 width + u16 height, then a
  zlib-compressed raw ``uint8`` RGB buffer of shape ``(h, w, 3)``;
- ``fmt="png"``  -> mode 0, lossless;
- ``fmt="jpeg"`` -> mode 1, lossy: uniform quantization with step ``Q=4``
  to the cell center. Quantization error is in ``{-2,-1,0,+1}`` per
  channel => MSE <= 1.5 => PSNR >= ~46 dB, comfortably above the 40 dB
  gate, and *idempotent*: re-encoding an already-quantized image is
  byte-identical (mirrors how compaction re-encode must not degrade
  quality round over round).

All kernels are numpy-vectorized per image; the per-row loop exists only
because images have variable shapes (binary column), matching how a real
decode stage would batch variable-size payloads.

Reference semantics mirrored: the compaction data path re-encodes rows it
rewrites (``/root/reference/src/moonlink/src/storage/compaction/
compactor.rs:170-293`` streams, filters and rewrites victim files).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"MLI1"
_HEADER = struct.Struct("<4sBHH")  # magic, mode, w, h
MODE_LOSSLESS = 0
MODE_LOSSY = 1
Q = 4  # lossy quantization step
_ZLEVEL = 1  # speed over ratio; determinism is what matters

FMT_TO_MODE = {"png": MODE_LOSSLESS, "jpeg": MODE_LOSSY}


def quantize(arr: np.ndarray) -> np.ndarray:
    """Map every uint8 sample to the center of its Q-wide cell (idempotent)."""
    return ((arr // Q) * Q + Q // 2).astype(np.uint8)


def encode(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array into MLI1 bytes."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    mode = FMT_TO_MODE[fmt]
    if mode == MODE_LOSSY:
        arr = quantize(arr)
    h, w = arr.shape[:2]
    payload = zlib.compress(np.ascontiguousarray(arr).tobytes(), _ZLEVEL)
    return _HEADER.pack(MAGIC, mode, w, h) + payload


def decode(buf: bytes) -> np.ndarray:
    """Decode MLI1 bytes back to an (h, w, 3) uint8 RGB array."""
    magic, mode, w, h = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("not an MLI1 image")
    raw = zlib.decompress(buf[_HEADER.size:])
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return arr


def decode_header(buf: bytes) -> tuple[int, int, int]:
    """Return (mode, w, h) without decompressing the payload."""
    magic, mode, w, h = _HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError("not an MLI1 image")
    return mode, w, h


def reencode(buf: bytes, fmt: str) -> bytes:
    """Decode + re-encode (the compaction hot path)."""
    return encode(decode(buf), fmt)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays (inf if equal).

    One float32 temporary + a BLAS dot instead of three float64 arrays:
    this runs per image in the compaction verify hot path, and the VM's
    page-fault bandwidth (not FLOPs) is the scarce resource. float32
    accumulation error (~1e-3 relative on a 1e11 sum) is far inside the
    40 dB gate's ~6 dB margin.
    """
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    d = np.subtract(a, b, dtype=np.float32).ravel()
    mse = float(np.dot(d, d)) / d.size
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


_IDX8 = np.arange(8)
_BITW = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))  # MSB-first weights


def phash(arr: np.ndarray) -> int:
    """64-bit average-hash of the decoded pixels, as a signed int64.

    Grayscale -> 8x8 strided sample -> threshold on the mean -> pack bits
    (row-major, MSB first). Deterministic for a given pixel array.
    """
    gray = arr.astype(np.float32).mean(axis=2)
    h, w = gray.shape
    ri = ((_IDX8 * 2 + 1) * h) // 16
    ci = ((_IDX8 * 2 + 1) * w) // 16
    g8 = gray[np.ix_(ri, ci)]
    bits = (g8 > g8.mean()).astype(np.uint64).ravel()
    val = np.bitwise_or.reduce(bits * _BITW)
    return int(val.astype(np.int64))


def phash_u64_to_i64(v: int) -> int:
    return int(np.uint64(v).astype(np.int64))
