import numpy as np
import pytest

from moonlink_ray import codec, synth
from moonlink_ray.stages.multimodal import (AudioFeatureStub, ImageDecodeStats,
                                            ImagePhash, ImageResize,
                                            VideoFrameSampleStub)


def _batch(n=5):
    return synth.build_rows(range(n))


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


def test_stubs_raise():
    with pytest.raises(NotImplementedError):
        AudioFeatureStub()(_batch())
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
class TestStubContracts:
    def test_audio_stub_contract(self):
        import pyarrow as pa
        from moonlink_ray.stages.multimodal import AudioFeatureStub
        stub = AudioFeatureStub()
        # schema contract is declared even though decode is stubbed
        assert [n for n, _ in stub.OUTPUT_FIELDS] == [
            "sample_rate", "duration_s", "rms", "mfcc"]
        with pytest.raises(NotImplementedError, match="soundfile"):
            stub(pa.table({"bytes": pa.array([b"x"], pa.binary())}))

    def test_video_stub_contract(self):
        import pyarrow as pa
        from moonlink_ray.stages.multimodal import VideoFrameSampleStub
        stub = VideoFrameSampleStub(n_frames=4)
        assert stub.n_frames == 4
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            stub(pa.table({"bytes": pa.array([b"x"], pa.binary())}))
