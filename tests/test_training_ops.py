"""Training-data prep operators: sequence packing + balanced sampling.

Both are oracled by the driver against DuckDB SQL; here each is proven
against a literal single-threaded Python reference on the sf0.001
documents table so the semantics are pinned independently of SQL.
"""

import os
import re

import numpy as np
import pyarrow.parquet as pq
import pytest

from moonlink_ray import queries

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF}/documents.parquet"),
    reason="driver testdata not present")


@pytest.mark.usefixtures("ray_session")
class TestPackSequences:
    def test_matches_literal_packing(self):
        out = queries.text_pack_sequences(SF).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        docs = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "text"]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # literal reference: walk each shard in doc_id order, cut at 1024
        tok = {int(r.doc_id): len(re.findall(r"\S+", r.text or ""))
               for r in docs.itertuples()}
        expect = {}
        for s in range(32):
            off = 0
            for d in sorted(i for i in tok if i % 32 == s):
                expect[d] = (s, off // 1024, tok[d])
                off += tok[d]
        assert len(out) == len(docs)
        for r in out.itertuples():
            assert expect[int(r.doc_id)] == \
                (int(r.shard), int(r.pack_id), int(r.tokens))

    def test_pack_ids_dense_and_monotone(self):
        out = queries.text_pack_sequences(SF).to_pandas()
        for _, g in out.groupby("shard"):
            g = g.sort_values("doc_id")
            pid = g["pack_id"].to_numpy()
            assert (np.diff(pid) >= 0).all()      # monotone in doc order
            assert pid[0] == 0                     # packs start at 0
            assert set(np.unique(pid)) == set(range(pid.max() + 1))


@pytest.mark.usefixtures("ray_session")
class TestSampleBalanced:
    def test_thins_to_smallest_domain(self):
        full = pq.read_table(f"{SF}/documents.parquet",
                             columns=["doc_id", "source"]).to_pandas()
        out = queries.rel_sample_balanced(SF).to_pandas()
        cnt = full.groupby("source").size()
        mn = int(cnt.min())
        kept = out.groupby("source").size()
        for src, c in cnt.items():
            k = -(-int(c) // mn)
            ids = full.loc[full["source"] == src, "doc_id"].to_numpy()
            expect = set(ids[ids % k == 0])
            got = set(out.loc[out["source"] == src, "doc_id"])
            assert got == expect
            # the modulus rule lands within ~2x of the target share
            if src in kept.index:
                assert kept[src] <= 2 * mn + k
