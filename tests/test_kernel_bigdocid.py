"""Kernel correctness at 10^12-scale docid ranges.

The dense accumulator stores *shard-local* int32 offsets with an int64
base (``plans/wand.py``): at 10^12 docs the base exceeds int32 while
offsets stay < shard_size. This exercises that boundary end-to-end
through both kernel modes — the class of bug the round-2 overflow fix
(int64 before adding the base in the AND phase) caught once already.
Pure-kernel test, no Spark session needed."""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from pylate_spark.config import BM25Params
from pylate_spark.functions.bm25 import idf_np, tfn_np
from pylate_spark.plans.segments import encode_group_arrow
from pylate_spark.plans.wand import score_shard

SHARD_SIZE = 2**20
SHARD = 10**12 // SHARD_SIZE + 7  # base = SHARD * SHARD_SIZE ≈ 1.0e12 >> 2^31
BASE = SHARD * SHARD_SIZE
N_DOCS_GLOBAL = 10**12
AVGDL = 200.0
PARAMS = BM25Params()


def _shard_pdf(seed=5):
    rng = np.random.Generator(np.random.Philox(key=seed, counter=0))
    frames = {"shard": [], "bucket": [], "term": [], "docid": [], "tf": [], "dl": []}
    postings = {}
    dl_by_doc = {}
    for term in ("head", "mid", "tail"):
        n = {"head": 4000, "mid": 300, "tail": 7}[term]
        docids = BASE + np.sort(rng.choice(SHARD_SIZE, size=n, replace=False))
        tfs = rng.integers(1, 20, size=n).astype(np.int64)
        for d in docids:
            dl_by_doc.setdefault(int(d), int(rng.integers(50, 400)))
        dls = np.array([dl_by_doc[int(d)] for d in docids], dtype=np.int64)
        postings[term] = (docids, tfs, dls)
        frames["shard"].append(np.full(n, SHARD, dtype=np.int64))
        frames["bucket"].append(np.full(n, zlib.crc32(term.encode()) % 64, dtype=np.int64))
        frames["term"].append(np.full(n, term, dtype=object))
        frames["docid"].append(docids)
        frames["tf"].append(tfs)
        frames["dl"].append(dls)
    import pandas as pd

    order = np.lexsort(
        (np.concatenate(frames["docid"]), np.concatenate(frames["term"]).astype("U"))
    )
    cat = {k: np.concatenate(v)[order] for k, v in frames.items()}
    pdf = encode_group_arrow(
        cat["shard"], cat["bucket"], cat["term"], cat["docid"], cat["tf"], cat["dl"], 128
    ).to_pandas()
    pdf["shard"] = SHARD
    return pd.DataFrame(pdf), postings


def _brute_force(postings, idf, qterms, k):
    acc: dict[int, float] = {}
    for t in qterms:
        docids, tfs, dls = postings[t]
        contrib = idf[t] * tfn_np(tfs.astype(np.float64), dls.astype(np.float64), AVGDL, PARAMS)
        for d, c in zip(docids.tolist(), contrib.tolist()):
            acc[d] = acc.get(d, 0.0) + c
    items = sorted(acc.items(), key=lambda kv: (-np.float32(kv[1]), kv[0]))[:k]
    return [(d, np.float32(s)) for d, s in items]


@pytest.mark.parametrize("mode", ["exhaustive", "cascade"])
def test_kernel_exact_at_1e12_docid_base(mode):
    pdf, postings = _shard_pdf()
    idf = {t: float(idf_np(len(postings[t][0]) * 10, N_DOCS_GLOBAL)) for t in postings}
    queries = {0: ["head", "mid", "tail"], 1: ["head"], 2: ["tail", "mid"]}
    out = score_shard(
        pdf, queries, idf, AVGDL, 10, PARAMS, mode=mode, shard_size=SHARD_SIZE
    )
    assert (out["docid"] >= BASE).all() and (out["docid"] < BASE + SHARD_SIZE).all()
    for qid, qterms in queries.items():
        got = [
            (int(r.docid), np.float32(r.score))
            for r in out[out["query_id"] == qid].itertuples()
        ]
        want = _brute_force(postings, idf, qterms, 10)
        assert [d for d, _ in got] == [d for d, _ in want], f"qid={qid} mode={mode}"
        np.testing.assert_allclose(
            [s for _, s in got], [s for _, s in want], rtol=1e-6
        )


def test_kernel_tombstones_and_subset_at_1e12(  ):
    """Sorted-array filters must behave identically at big docid bases."""
    pdf, postings = _shard_pdf()
    idf = {t: float(idf_np(len(postings[t][0]) * 10, N_DOCS_GLOBAL)) for t in postings}
    queries = {0: ["head", "mid"]}
    full = score_shard(pdf, queries, idf, AVGDL, 5, PARAMS, mode="exhaustive",
                       shard_size=SHARD_SIZE)
    top = full.sort_values("score", ascending=False)
    kill = np.sort(top["docid"].to_numpy(np.int64)[:2])
    out = score_shard(pdf, queries, idf, AVGDL, 5, PARAMS, mode="cascade",
                      tombstones=kill, shard_size=SHARD_SIZE)
    assert not np.isin(out["docid"].to_numpy(np.int64), kill).any()
    keep = np.sort(top["docid"].to_numpy(np.int64)[1:4])
    out2 = score_shard(pdf, queries, idf, AVGDL, 5, PARAMS, mode="cascade",
                       allowed=keep, shard_size=SHARD_SIZE)
    assert set(out2["docid"].tolist()) <= set(keep.tolist())
