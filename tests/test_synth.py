"""Synthesis determinism: the vectorized/parallel CDC assembly must be
bit-identical to a straightforward per-row reference (cache fingerprints
assume content is a pure function of (seed, params, SYNTH_VERSION))."""

import numpy as np
import pyarrow as pa

from moonlink_ray import synth


def _reference_cdc(n_base: int, n_ops: int, seed: int, start_lsn: int) -> pa.Table:
    """Per-row assembly mirroring the original implementation."""
    rng = np.random.default_rng(seed)
    cols = {name: [] for name in ("image_id", "_op", "_lsn", "_seq",
                                  "content_idx")}
    fresh = n_base
    hot = [synth.image_id(i) for i in range(min(4, n_base))]
    for j in range(n_ops):
        lsn = start_lsn + j
        r = float(rng.random())
        if rng.random() < 0.05 and hot:
            op, iid = "upsert", hot[int(rng.integers(0, len(hot)))]
        elif r < 0.6:
            op, iid = "upsert", synth.image_id(int(rng.integers(0, n_base)))
        elif r < 0.8:
            op, iid = "insert", synth.image_id(fresh)
            fresh += 1
        else:
            if rng.random() < 0.10:
                op, iid = "delete", synth.image_id(
                    900_000_000_000 + int(rng.integers(0, 10_000)))
            else:
                op, iid = "delete", synth.image_id(int(rng.integers(0, n_base)))
        cols["image_id"].append(iid)
        cols["_op"].append(op)
        cols["_lsn"].append(lsn)
        cols["_seq"].append(0)
        cols["content_idx"].append(j if op != "delete" else -1)

    live = [k for k, c in enumerate(cols["content_idx"]) if c >= 0]
    content = synth.build_rows([cols["content_idx"][k] for k in live],
                               seed=seed,
                               content_offset=synth._CDC_CONTENT_OFFSET)
    by_pos = {k: r for k, r in zip(live, range(content.num_rows))}
    out = {name: [] for name in synth.CDC_SCHEMA.names}
    for k in range(n_ops):
        out["image_id"].append(cols["image_id"][k])
        out["_op"].append(cols["_op"][k])
        out["_lsn"].append(cols["_lsn"][k])
        out["_seq"].append(cols["_seq"][k])
        if k in by_pos:
            r = by_pos[k]
            for c in ("bytes", "w", "h", "fmt", "caption", "phash"):
                out[c].append(content[c][r].as_py())
        else:
            for c in ("bytes", "w", "h", "fmt", "caption", "phash"):
                out[c].append(None)
    return pa.table(out, schema=synth.CDC_SCHEMA)


class TestCdcAssembly:
    def test_vectorized_matches_reference(self):
        got = synth.build_cdc(40, 60)
        want = _reference_cdc(40, 60, seed=synth.SEED + 1, start_lsn=1_000)
        assert got.schema == want.schema
        assert got.equals(want)

    def test_parallel_chunking_matches_serial(self, ray_session):
        idxs = list(range(25))
        serial = synth.build_rows(idxs)
        chunked = synth.build_rows_parallel(idxs, chunk=5)
        assert chunked.equals(serial)
