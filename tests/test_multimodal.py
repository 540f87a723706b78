import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from moonlink_ray import codec, synth
from moonlink_ray.stages.multimodal import (AudioFeatures, ImageDecodeStats,
                                            ImagePhash, ImageResize,
                                            VideoFrameSampleStub)


def _batch(n=5):
    return synth.build_rows(range(n))


def _wav_bytes(freq=440.0, sr=8000, seconds=0.5, amp=0.5, nch=1, width=2):
    n = int(sr * seconds)
    t = np.arange(n) / sr
    x = amp * np.sin(2 * np.pi * freq * t)
    if width == 2:
        pcm = (x * 32767).astype(np.int16)
    elif width == 1:
        pcm = ((x * 127) + 128).astype(np.uint8)
    else:
        pcm = (x * (2 ** 31 - 1)).astype(np.int32)
    if nch > 1:
        pcm = np.repeat(pcm[:, None], nch, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_decode_stats_match_direct():
    b = _batch()
    out = ImageDecodeStats()(b)
    for i in range(b.num_rows):
        arr = codec.decode(b["bytes"][i].as_py())
        assert out["decoded_w"][i].as_py() == arr.shape[1] == b["w"][i].as_py()
        assert out["decoded_h"][i].as_py() == arr.shape[0] == b["h"][i].as_py()
        assert abs(out["mean_r"][i].as_py() - arr[:, :, 0].mean()) < 1e-9


def test_resize():
    out = ImageResize(out_w=32, out_h=16)(_batch())
    for i in range(out.num_rows):
        arr = codec.decode(out["bytes"][i].as_py())
        assert arr.shape == (16, 32, 3)
    assert out["w"].to_pylist() == [32] * 5
    assert out["h"].to_pylist() == [16] * 5


def test_phash_check_matches_column():
    b = _batch(8)
    out = ImagePhash()(b)
    assert out["phash_check"].to_pylist() == b["phash"].to_pylist()


class TestAudioFeatures:
    def test_sine_features(self):
        blob = _wav_bytes(freq=440.0, sr=8000, seconds=0.5, amp=0.5)
        batch = pa.table({"clip_id": pa.array(["a"]),
                          "bytes": pa.array([blob], pa.binary())})
        out = AudioFeatures()(batch)
        assert out["sample_rate"][0].as_py() == 8000
        assert out["n_channels"][0].as_py() == 1
        assert abs(out["duration_s"][0].as_py() - 0.5) < 1e-6
        # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
        assert abs(out["rms"][0].as_py() - 0.5 / np.sqrt(2)) < 1e-3
        # a pure tone's spectral centroid sits at its frequency
        assert abs(out["spectral_centroid_hz"][0].as_py() - 440.0) < 10.0
        # a 440 Hz tone at 8 kHz crosses zero ~2*440 times per second
        assert abs(out["zcr"][0].as_py() - 2 * 440.0 / 8000.0) < 0.01

    def test_widths_and_channels(self):
        blobs = [_wav_bytes(width=1), _wav_bytes(width=2),
                 _wav_bytes(width=4), _wav_bytes(nch=2)]
        batch = pa.table({"bytes": pa.array(blobs, pa.binary())})
        out = AudioFeatures()(batch)
        assert out["n_channels"].to_pylist() == [1, 1, 1, 2]
        for rms in out["rms"].to_pylist():
            assert abs(rms - 0.5 / np.sqrt(2)) < 5e-3

    def test_bad_blob_raises(self):
        batch = pa.table({"bytes": pa.array([b"not a wav"], pa.binary())})
        with pytest.raises(Exception):
            AudioFeatures()(batch)


def test_video_stub_raises():
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStub()(_batch())


@pytest.mark.usefixtures("ray_session")
def test_actor_pool_plumbing(tmp_table):
    from moonlink_ray.sources.scan import scan
    ds = scan(tmp_table).map_batches(ImageDecodeStats, batch_format="pyarrow",
                                     batch_size=32, concurrency=2)
    out = ds.select_columns(["image_id", "decoded_w"]).to_pandas()
    assert len(out) == 200


@pytest.mark.usefixtures("ray_session")
def test_audio_actor_pool_plumbing():
    import ray.data as rd
    items = [{"clip_id": f"c{i}",
              "bytes": _wav_bytes(freq=200.0 + 50 * i)} for i in range(12)]
    ds = rd.from_items(items).map_batches(
        AudioFeatures, batch_format="pyarrow", batch_size=4, concurrency=2)
    out = ds.select_columns(["clip_id", "spectral_centroid_hz"]).to_pandas()
    assert len(out) == 12
    got = dict(zip(out["clip_id"], out["spectral_centroid_hz"]))
    for i in range(12):
        assert abs(got[f"c{i}"] - (200.0 + 50 * i)) < 15.0


class TestVideoStubContract:
    def test_video_stub_contract(self):
        stub = VideoFrameSampleStub(n_frames=4)
        assert stub.n_frames == 4
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            stub(pa.table({"bytes": pa.array([b"x"], pa.binary())}))
