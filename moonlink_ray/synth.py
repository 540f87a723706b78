"""Deterministic synthetic image+caption tables (FIXTURES.md F1/F2).

No external data: every byte derives from ``numpy.random.default_rng``
seeded by (seed, row index). Pixels are low-resolution random RGB
upscaled to the row's (h, w) so they compress (zlib) like natural
images rather than noise, and so phash has real structure. 10% of rows
reuse one of 8 base images with tiny noise — their phash collides into
a few hot buckets, exercising the Z-order skew salting the north rule
demands.

The CDC stream mirrors moonlink's op model: insert / upsert / delete
with strictly increasing LSNs; upsert == delete-if-exists + append at
one LSN (``/root/reference/src/moonlink/src/rest_ingest/
moonlink_rest_sink.rs:198-223``); ~10% of deletes target never-existing
ids (the delete_if_exists no-op path, ``.../mooncake_table/
snapshot.rs:795-817``); a slice of ops hammers a hot id set
(merge-skew exercise).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from . import codec

SEED = 42
SYNTH_VERSION = 2  # bump on any content-changing synth edit (cache keys)
_BASE_OFFSET = 10_000_000_019  # rng stream namespace for the 8 hot base images
_CDC_CONTENT_OFFSET = 20_000_000_003

IMAGES_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

CDC_SCHEMA = pa.schema(list(IMAGES_SCHEMA) + [
    ("_op", pa.string()),
    ("_lsn", pa.int64()),
    ("_seq", pa.int64()),
])

VOCAB = (
    "amber basalt cedar delta ember fjord garnet harbor indigo juniper "
    "krill lagoon marble nectar onyx prairie quartz russet sable tundra "
    "umber velvet willow xenon yarrow zephyr anvil breeze cobalt dune "
    "echo flint grove haze isle jade knoll lichen mesa north orbit pine "
    "quill ridge slate thorn under vale wharf yield zonal arc bloom crag "
    "drift evergreen fog glint hollow iris jetty kelp loom mist"
).split()
assert len(VOCAB) == 64


def image_id(i: int) -> str:
    return f"img-{i:012d}"


def _row_dims(i: int, scale: int = 1) -> tuple[int, int]:
    return (64 + (i * 37) % 193) * scale, (64 + (i * 53) % 161) * scale  # (w, h)


def _upscale(low: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbour upscale of an (8, 8, 3) tile to (h, w, 3)."""
    fh, fw = math.ceil(h / 8), math.ceil(w / 8)
    big = np.repeat(np.repeat(low, fh, axis=0), fw, axis=1)
    return np.ascontiguousarray(big[:h, :w])


def gen_pixels(i: int, seed: int = SEED, scale: int = 1) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for row index i.

    ``scale`` multiplies the dimensions (bench fixtures use scale > 1 so
    the codec does natural-image-sized work). All rows carry per-pixel
    noise so zlib sees realistic entropy, not a free ride on flat tiles.
    """
    if i % 10 == 9:  # hot near-duplicate rows: one of 8 base images + noise
        b = (i // 10) % 8
        base_rng = np.random.default_rng(seed * 1_000_000_007 + _BASE_OFFSET + b)
        w, h = (128 + b * 8) * scale, (96 + b * 8) * scale
        low = base_rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        arr = _upscale(low, h, w).astype(np.int16)
        noise_rng = np.random.default_rng(seed * 1_000_000_007 + i)
        arr = arr + noise_rng.integers(-2, 3, size=arr.shape, dtype=np.int16)
        return np.clip(arr, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(seed * 1_000_000_007 + i)
    w, h = _row_dims(i, scale)
    low = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    arr = _upscale(low, h, w).astype(np.int16)
    arr = arr + rng.integers(-6, 7, size=arr.shape, dtype=np.int16)
    return np.clip(arr, 0, 255).astype(np.uint8)


def gen_caption(i: int, seed: int = SEED) -> str:
    rng = np.random.default_rng(seed * 999_999_937 + i)
    k = int(5 + rng.integers(0, 11))
    words = [VOCAB[int(j)] for j in rng.integers(0, 64, size=k)]
    return f"caption {i}: " + " ".join(words)


def row_fmt(i: int) -> str:
    return "png" if i % 4 == 0 else "jpeg"


def build_rows(indices, seed: int = SEED, content_offset: int = 0,
               scale: int = 1) -> pa.Table:
    """Materialize image rows for the given row indices as an Arrow table.

    ``content_offset`` shifts the pixel/caption streams so CDC upserts
    produce *different* content for an existing image_id.
    """
    ids, blobs, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
    for i in indices:
        i = int(i)
        ci = i + content_offset
        arr = gen_pixels(ci, seed, scale)
        fmt = row_fmt(ci)
        buf = codec.encode(arr, fmt)
        stored = codec.quantize(arr) if fmt == "jpeg" else arr
        ids.append(image_id(i))
        blobs.append(buf)
        hs.append(arr.shape[0])
        ws.append(arr.shape[1])
        fmts.append(fmt)
        caps.append(gen_caption(ci, seed))
        phs.append(codec.phash(stored))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phs, pa.int64()),
    }, schema=IMAGES_SCHEMA)


def build_cdc(n_base: int, n_ops: int, *, seed: int = SEED + 1,
              start_lsn: int = 1_000) -> pa.Table:
    """F2 CDC batch over a base table of ``n_base`` rows.

    60% upserts of existing ids, 20% inserts of fresh ids, 20% deletes
    (10% of which target never-existing ids); ~5% of ops redirect to a
    hot id set. One op per LSN (update-as-delete+insert pairs at a
    shared LSN are exercised by the hand-written F3 fixtures instead).
    """
    rng = np.random.default_rng(seed)
    cols = {name: [] for name in ("image_id", "_op", "_lsn", "_seq", "content_idx")}
    fresh = n_base
    hot = [image_id(i) for i in range(min(4, n_base))]
    for j in range(n_ops):
        lsn = start_lsn + j
        r = float(rng.random())
        if rng.random() < 0.05 and hot:
            op, iid = "upsert", hot[int(rng.integers(0, len(hot)))]
        elif r < 0.6:
            op, iid = "upsert", image_id(int(rng.integers(0, n_base)))
        elif r < 0.8:
            op, iid = "insert", image_id(fresh)
            fresh += 1
        else:
            if rng.random() < 0.10:
                op, iid = "delete", image_id(900_000_000_000 + int(rng.integers(0, 10_000)))
            else:
                op, iid = "delete", image_id(int(rng.integers(0, n_base)))
        cols["image_id"].append(iid)
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(0)
        cols["content_idx"].append(j if op != "delete" else -1)

    # materialize content for insert/upsert rows (parallel when a Ray
    # session exists), then assemble vectorized: a take with null
    # indices aligns content rows to op positions — no per-cell Python
    live = [k for k, c in enumerate(cols["content_idx"]) if c >= 0]
    content = build_rows_parallel([cols["content_idx"][k] for k in live],
                                  seed=seed,
                                  content_offset=_CDC_CONTENT_OFFSET)
    import pyarrow.compute as pc
    idx = np.full(n_ops, -1, dtype=np.int64)
    idx[live] = np.arange(len(live), dtype=np.int64)
    take_idx = pa.array(idx, mask=idx < 0)
    arrays = []
    for field in CDC_SCHEMA:
        if field.name == "image_id":
            arrays.append(pa.array(cols["image_id"], field.type))
        elif field.name in ("_op", "_lsn", "_seq"):
            arrays.append(pa.array(cols[field.name], field.type))
        else:
            taken = pc.take(content[field.name], take_idx)
            arrays.append(taken.combine_chunks()
                          if isinstance(taken, pa.ChunkedArray) else taken)
    return pa.table(arrays, schema=CDC_SCHEMA)


def build_rows_parallel(indices, seed: int = SEED, content_offset: int = 0,
                        scale: int = 1, chunk: int = 128) -> pa.Table:
    """``build_rows`` fanned out over Ray tasks (row-identical output:
    each index's content is independent, and chunked concat preserves
    order). Falls back to the serial path without a Ray session or for
    small inputs."""
    indices = [int(i) for i in indices]
    try:
        import ray
        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if not have_ray or len(indices) < 2 * chunk:
        return build_rows(indices, seed=seed, content_offset=content_offset,
                          scale=scale)

    import ray

    @ray.remote
    def _chunk(idxs: list[int]) -> pa.Table:
        return build_rows(idxs, seed=seed, content_offset=content_offset,
                          scale=scale)

    refs = [_chunk.remote(indices[i:i + chunk])
            for i in range(0, len(indices), chunk)]
    return pa.concat_tables(ray.get(refs)).combine_chunks()
