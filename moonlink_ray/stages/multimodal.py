"""Multimodal (image/audio/video) stages.

Images are opaque ``binary`` columns with typed metadata (w, h, fmt) —
exactly the engine's table schema. Decode/resize/feature stages are
actor-pool ``map_batches`` callables: codec state initialized once per
actor, small batch sizes because rows are wide.

The sandbox has no PIL/libjpeg/ffmpeg, so:
- image decode is REAL against the deterministic MLI1 codec
  (``moonlink_ray.codec``) — the Ray-side plumbing (schema, batch
  size, actor signature, output layout) is what is being engineered
  and tested;
- audio decode is REAL for WAV/PCM via stdlib ``wave`` + numpy
  (AudioFeatures);
- video remains a clearly-marked stub (frame sampling genuinely needs
  ffmpeg) with the real signature and output schema a production build
  would bind to.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codec


class ImageDecodeStats:
    """Actor-pool stage: decode image bytes -> per-channel mean/std +
    dims. Output schema: input columns + (mean_r, mean_g, mean_b,
    std_gray, decoded_w, decoded_h) [+ phash_check with
    ``with_phash``: the integrity recompute rides the SAME decode — one
    pixel pass serves both, the natural fused pipeline shape]."""

    def __init__(self, with_phash: bool = False):
        self.decode = codec.decode  # codec context held per actor
        self.with_phash = with_phash

    def __call__(self, batch: pa.Table) -> pa.Table:
        means = np.empty((batch.num_rows, 3), dtype=np.float64)
        stds = np.empty(batch.num_rows, dtype=np.float64)
        dims = np.empty((batch.num_rows, 2), dtype=np.int32)
        ph = np.empty(batch.num_rows, dtype=np.int64)
        for i, buf in enumerate(batch["bytes"].to_pylist()):
            arr = self.decode(buf)
            means[i] = arr.reshape(-1, 3).mean(axis=0)
            stds[i] = arr.astype(np.float32).mean(axis=2).std()
            dims[i] = (arr.shape[1], arr.shape[0])
            if self.with_phash:
                ph[i] = codec.phash(arr)
        batch = (batch
                 .append_column("mean_r", pa.array(means[:, 0]))
                 .append_column("mean_g", pa.array(means[:, 1]))
                 .append_column("mean_b", pa.array(means[:, 2]))
                 .append_column("std_gray", pa.array(stds))
                 .append_column("decoded_w", pa.array(dims[:, 0], pa.int32()))
                 .append_column("decoded_h", pa.array(dims[:, 1], pa.int32())))
        if self.with_phash:
            batch = batch.append_column("phash_check",
                                        pa.array(ph, pa.int64()))
        return batch


class ImageResize:
    """Actor-pool stage: nearest-neighbour resize to (out_w, out_h),
    re-encode with the row's own fmt. Real against MLI1."""

    def __init__(self, out_w: int = 64, out_h: int = 64):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = []
        for buf, fmt in zip(batch["bytes"].to_pylist(),
                            batch["fmt"].to_pylist()):
            arr = codec.decode(buf)
            ri = (np.arange(self.out_h) * arr.shape[0]) // self.out_h
            ci = (np.arange(self.out_w) * arr.shape[1]) // self.out_w
            small = np.ascontiguousarray(arr[np.ix_(ri, ci)])
            blobs.append(codec.encode(small, fmt))
        out = batch.set_column(batch.column_names.index("bytes"), "bytes",
                               pa.array(blobs, pa.binary()))
        w_i = out.column_names.index("w")
        out = out.set_column(w_i, "w", pa.array([self.out_w] * out.num_rows, pa.int32()))
        h_i = out.column_names.index("h")
        return out.set_column(h_i, "h", pa.array([self.out_h] * out.num_rows, pa.int32()))


class ImagePhash:
    """Actor-pool stage: recompute phash from decoded pixels (integrity
    check / backfill). Adds ``phash_check`` column."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ph = [codec.phash(codec.decode(b)) for b in batch["bytes"].to_pylist()]
        return batch.append_column("phash_check", pa.array(ph, pa.int64()))


class AudioFeatures:
    """Actor-pool stage: decode WAV/PCM audio bytes (stdlib ``wave`` +
    numpy — no external audio libs needed) and emit per-clip features.

    Input: a binary column (default ``bytes``) holding RIFF/WAVE blobs
    with 8/16/32-bit integer PCM. Output: input columns +
    (sample_rate:int32, n_channels:int32, duration_s:float64,
    rms:float64, zcr:float64, spectral_centroid_hz:float64).
    rms/zcr/centroid are computed on the channel-averaged float signal;
    the centroid is the FFT-magnitude-weighted mean frequency. Rows are
    variable-length blobs, so like the image stages the per-row loop is
    inherent; all per-sample math is vectorized numpy."""

    _WIDTH_DTYPE = {1: np.uint8, 2: np.int16, 4: np.int32}

    def __init__(self, bytes_col: str = "bytes"):
        self.bytes_col = bytes_col

    def _features(self, blob: bytes):
        import io
        import wave
        with wave.open(io.BytesIO(blob), "rb") as wf:
            sr = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            n = wf.getnframes()
            raw = wf.readframes(n)
        try:
            dtype = self._WIDTH_DTYPE[width]
        except KeyError:
            raise ValueError(f"unsupported PCM sample width {width}") from None
        x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if width == 1:
            x -= 128.0  # 8-bit WAV is unsigned
        x /= float(2 ** (8 * width - 1))
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        if len(x) == 0:
            return sr, nch, 0.0, 0.0, 0.0, 0.0
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        mag = np.abs(np.fft.rfft(x))
        freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
        total = mag.sum()
        centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
        return sr, nch, len(x) / sr, rms, zcr, centroid

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(b) for b in batch[self.bytes_col].to_pylist()]
        cols = list(zip(*feats)) if feats else [[]] * 6
        return (batch
                .append_column("sample_rate", pa.array(cols[0], pa.int32()))
                .append_column("n_channels", pa.array(cols[1], pa.int32()))
                .append_column("duration_s", pa.array(cols[2], pa.float64()))
                .append_column("rms", pa.array(cols[3], pa.float64()))
                .append_column("zcr", pa.array(cols[4], pa.float64()))
                .append_column("spectral_centroid_hz",
                               pa.array(cols[5], pa.float64())))


class VideoFrameSampleStub:
    """STUB (no ffmpeg in this container). Production: sample N frames
    uniformly; per-batch output schema: one row per sampled frame,
    (video_id:string, frame_idx:int32, frame_bytes:binary)."""

    def __init__(self, n_frames: int = 8):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decode requires ffmpeg (absent in this container); "
            "the stage contract is the schema above")
