import pyarrow as pa
import pytest

from moonlink_ray.stages import text


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))),
                     "text": pa.array(texts, pa.string())})


def test_token_stats():
    out = text.token_stats(_batch(["one two  three", "", "a"]))
    assert out["token_count"].to_pylist() == [3, 0, 1]
    assert out["char_count"].to_pylist() == [14, 0, 1]
    assert out["alpha_ratio"].to_pylist()[2] == 1.0


def test_quality_score_ranges():
    good = "the cat and the dog ran to the park and it was a fine day " * 10
    bad = "@@@ ### $$$ 123 456"
    out = text.quality_score(_batch([good, bad]))
    q = out["quality"].to_pylist()
    assert 0 <= q[1] < q[0] <= 1


def test_lang_id():
    out = text.lang_id(_batch([
        "the cat and the dog in the house for a while",
        "el perro y la casa de que en un dia por la noche",
        "der hund und die katze ist ein tier zu hause mit von",
        "le chien et la maison est un animal que pour dans le jour",
        "这是一个中文句子用来测试语言识别功能是否正常工作",
    ]))
    assert out["lang_pred"].to_pylist() == ["en", "es", "de", "fr", "zh"]


def test_fingerprint_md5():
    import hashlib
    out = text.fingerprint(_batch(["hello world"]))
    assert out["fingerprint"].to_pylist()[0] == \
        hashlib.md5(b"hello world").hexdigest()


def test_rolling_fingerprint_robust_to_suffix_edit():
    base = "a long document body that stays mostly identical across edits " * 5
    a = base + "tail one"
    b = base + "completely different ending entirely"
    out = text.rolling_fingerprint(_batch([a, b, "short"]))
    fps = out["rolling_fp"].to_pylist()
    # min-of-rolling-hash picks the global min window, shared by a and b
    assert fps[0] == fps[1]
    assert fps[2] == 0  # below window size
