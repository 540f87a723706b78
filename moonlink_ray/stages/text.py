"""Text-analysis stages for large-scale training-data pipelines.

All kernels are vectorized (pandas string ops / numpy) inside
``map_batches``; regexes and stopword tables are module-level constants
compiled once per worker process. Each function is a batch transform
suitable for `ds.map_batches(fn, batch_format="pyarrow")`.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")
ALPHA_RE = re.compile(r"[A-Za-z]")
WORD_RE = re.compile(r"[a-z0-9']+")

# small per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "por"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"},
    "zh": set(),  # han-script detection below, not stopwords
}
_EN_STOP = STOPWORDS["en"]


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """token_count / char_count / alpha_ratio per row (whitespace tokens)."""
    s = batch[text_col].to_pandas()
    tokens = s.str.findall(TOKEN_RE)
    token_count = tokens.str.len().fillna(0).astype(np.int64)
    char_count = s.str.len().fillna(0).astype(np.int64)
    alpha = s.str.count(ALPHA_RE).fillna(0)
    alpha_ratio = (alpha / char_count.replace(0, 1)).astype(np.float64)
    return batch.append_column(
        "token_count", pa.array(token_count.values, pa.int64())
    ).append_column(
        "char_count", pa.array(char_count.values, pa.int64())
    ).append_column(
        "alpha_ratio", pa.array(alpha_ratio.values, pa.float64()))


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality score in [0,1]: length band + stopword ratio +
    alpha ratio (the classic cheap pretraining-data filters)."""
    s = batch[text_col].to_pandas().fillna("")
    toks = s.str.lower().str.findall(WORD_RE)
    ntok = toks.str.len().replace(0, 1)
    stop_ratio = toks.map(lambda ws: sum(w in _EN_STOP for w in ws)) / ntok
    nchar = s.str.len()
    len_score = np.clip(nchar / 500.0, 0, 1.0) * np.clip(2000.0 / nchar.replace(0, 1), 0, 1.0)
    alpha = s.str.count(ALPHA_RE) / nchar.replace(0, 1)
    score = (0.4 * len_score + 0.3 * np.clip(stop_ratio * 4, 0, 1) + 0.3 * alpha)
    return batch.append_column(
        "stopword_ratio", pa.array(stop_ratio.astype(np.float64).values)
    ).append_column(
        "quality", pa.array(score.astype(np.float64).values))


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Language-ID heuristic: han-script ratio -> zh; else the language
    whose stopword list hits the most tokens; ties/zero -> 'en'.

    Vectorized: one regex count for the han check, then stopword hits
    per language via explode + isin + groupby (hashed set lookups over
    the whole batch at once, no per-row Python loop)."""
    s = batch[text_col].to_pandas().fillna("").reset_index(drop=True)
    han = s.str.slice(0, 200).str.count(r"[一-鿿]") > 5
    toks = s.str.lower().str.findall(WORD_RE).explode()
    toks = toks.dropna()
    counts = pd.DataFrame(index=s.index)
    for lang in ("en", "es", "de", "fr"):  # dict order of STOPWORDS
        hits = toks[toks.isin(STOPWORDS[lang])].groupby(level=0).size()
        counts[lang] = hits.reindex(s.index, fill_value=0)
    # idxmax picks the FIRST max column -> 'en' wins ties / all-zero,
    # matching the strict-> scan order of the per-row version
    preds = counts.idxmax(axis=1)
    preds[han] = "zh"
    return batch.append_column("lang_pred", pa.array(preds.tolist(), pa.string()))


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (stable, oracle-
    checkable with DuckDB's md5())."""
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None
           for t in batch[text_col].to_pylist()]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def rolling_fingerprint(batch: pa.Table, text_col: str = "text",
                        window: int = 16) -> pa.Table:
    """Document fingerprint via min-of-rolling-hash (Rabin-style) over
    byte windows — robust to small edits (unlike md5). Not SQL-
    expressible; tested against a pure-python oracle in pytest."""
    B, M = 257, (1 << 31) - 1
    powers = np.array([pow(B, window - 1 - j, M) for j in range(window)],
                      dtype=np.int64)
    texts = batch[text_col].to_pylist()
    encoded = [(t or "").encode("utf-8", "ignore") for t in texts]
    lens = np.array([len(b) for b in encoded], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.int64)
    # one flat byte array for the whole batch: hash EVERY window once,
    # then per-doc minima via minimum.reduceat over each doc's valid
    # window range (windows crossing doc boundaries are never selected)
    ok = lens >= window
    if ok.any():
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        wins = np.lib.stride_tricks.sliding_window_view(flat, window).astype(np.int64)
        hashes = (wins * powers).sum(axis=1) % M  # fits: 255*2^31*16 < 2^43
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        # doc i's valid windows are hashes[start_i : start_i + valid_i]
        # (anything later crosses into the next doc); reduceat over
        # (start, end) index pairs gives each doc's min at the even slots
        valid = lens[ok] - window + 1
        seg_starts = starts[ok]
        seg = np.empty(2 * len(seg_starts), dtype=np.int64)
        seg[0::2] = seg_starts
        seg[1::2] = seg_starts + valid
        if seg[-1] >= len(hashes):  # last doc's end == array end
            seg = seg[:-1]
        out[ok] = np.minimum.reduceat(hashes, seg)[0::2]
    return batch.append_column("rolling_fp", pa.array(out, pa.int64()))
