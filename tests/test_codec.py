import numpy as np
import pytest

from moonlink_ray import codec, synth


def test_lossless_roundtrip():
    arr = synth.gen_pixels(4)  # i%4==0 -> png row
    buf = codec.encode(arr, "png")
    assert np.array_equal(codec.decode(buf), arr)


def test_lossy_psnr_and_idempotence():
    arr = synth.gen_pixels(1)
    buf = codec.encode(arr, "jpeg")
    dec = codec.decode(buf)
    assert codec.psnr(arr, dec) >= 40.0
    # quantization fixed point: re-encode is byte-identical
    assert codec.encode(dec, "jpeg") == buf


def test_header():
    arr = synth.gen_pixels(3)
    buf = codec.encode(arr, "jpeg")
    mode, w, h = codec.decode_header(buf)
    assert mode == codec.MODE_LOSSY
    assert (h, w) == arr.shape[:2]


def test_phash_deterministic_and_skewed():
    a = codec.phash(synth.gen_pixels(9))
    b = codec.phash(synth.gen_pixels(9))
    assert a == b
    # hot rows (i % 10 == 9, same base) collide in phash
    hot = {codec.phash(codec.quantize(synth.gen_pixels(i)))
           for i in range(9, 800, 10)}
    cold = {codec.phash(codec.quantize(synth.gen_pixels(i)))
            for i in range(0, 800, 10)}
    assert len(hot) < 32  # 8 bases +/- noise flips a few borderline bits
    assert len(cold) > 60


def test_psnr_inf_on_equal():
    arr = synth.gen_pixels(2)
    assert codec.psnr(arr, arr) == float("inf")


def test_bad_magic():
    with pytest.raises(ValueError):
        codec.decode(b"XXXX" + b"\x00" * 16)
