"""Adversarial kernel property test: on RANDOM corpora and queries,
``score_shard`` must satisfy cascade ≡ exhaustive ≡ brute-force numpy
oracle across the whole parameter surface (shard_size, block_size, k,
tombstones, allow-list subset, rounded/raw emit) — the reference's
legacy-equivalence pattern (``tests/test_colbert_scores.py:53-84``)
generalized from fixed fixtures to sampled ones. Deterministic
(derandomized hypothesis), pure-kernel — no Spark session.

The cascade's exactness argument is written down in ``plans/wand.py``'s
module docstring; this test is the sampling attack on it: small noisy
corpora maximize boundary events (θ ties at k, blocks straddling
candidates, terms vanishing under tombstones/subset, k > candidates).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pylate_spark.config import BM25Params
from pylate_spark.functions.bm25 import idf_np, tfn_np
from pylate_spark.plans.segments import encode_group_arrow
from pylate_spark.plans.wand import score_shard

PARAMS = BM25Params()
N_GLOBAL = 10_000  # global corpus size for idf (df values stay local)


@st.composite
def shard_case(draw):
    n_docs = draw(st.integers(min_value=1, max_value=40))
    vocab = [f"t{i}" for i in range(draw(st.integers(min_value=1, max_value=6)))]
    shard_size = 64 * draw(st.integers(min_value=1, max_value=3))
    shard = draw(st.integers(min_value=0, max_value=4))
    base = shard * shard_size
    offs = sorted(
        draw(
            st.sets(
                st.integers(min_value=0, max_value=shard_size - 1),
                min_size=n_docs,
                max_size=n_docs,
            )
        )
    )
    docs = {}
    for o in offs:
        tfs = {t: draw(st.integers(min_value=0, max_value=3)) for t in vocab}
        if sum(tfs.values()) == 0:
            tfs[vocab[0]] = 1
        docs[base + o] = tfs
    block_size = draw(st.integers(min_value=1, max_value=7))
    k = draw(st.integers(min_value=1, max_value=12))
    queries = {
        qid: draw(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=len(vocab), unique=True)
        )
        for qid in range(draw(st.integers(min_value=1, max_value=3)))
    }
    docids = sorted(docs)
    tomb = sorted(draw(st.sets(st.sampled_from(docids), max_size=max(1, n_docs // 3))))
    use_tomb = draw(st.booleans()) and tomb
    allowed = sorted(draw(st.sets(st.sampled_from(docids), max_size=n_docs)))
    use_allowed = draw(st.booleans()) and allowed
    round_to = draw(st.sampled_from([None, 4]))
    avgdl = draw(st.floats(min_value=2.0, max_value=40.0, allow_nan=False))
    return {
        "docs": docs,
        "shard": shard,
        "shard_size": shard_size,
        "block_size": block_size,
        "k": k,
        "queries": queries,
        "tomb": np.array(tomb, dtype=np.int64) if use_tomb else None,
        "allowed": np.array(allowed, dtype=np.int64) if use_allowed else None,
        "round_to": round_to,
        "avgdl": avgdl,
    }


def _encode(case) -> tuple[pd.DataFrame, dict]:
    """docs → encoded segment rows (the kernel's input) + raw postings."""
    postings: dict[str, list[tuple[int, int, int]]] = {}
    for d, tfs in case["docs"].items():
        dl = sum(tfs.values())
        for t, tf in tfs.items():
            if tf > 0:
                postings.setdefault(t, []).append((d, tf, dl))
    rows = {"shard": [], "bucket": [], "term": [], "docid": [], "tf": [], "dl": []}
    for t in sorted(postings):
        for d, tf, dl in sorted(postings[t]):
            rows["shard"].append(case["shard"])
            rows["bucket"].append(zlib.crc32(t.encode()) % 64)
            rows["term"].append(t)
            rows["docid"].append(d)
            rows["tf"].append(tf)
            rows["dl"].append(dl)
    pdf = encode_group_arrow(
        np.array(rows["shard"], dtype=np.int64),
        np.array(rows["bucket"], dtype=np.int64),
        np.array(rows["term"], dtype=object),
        np.array(rows["docid"], dtype=np.int64),
        np.array(rows["tf"], dtype=np.int64),
        np.array(rows["dl"], dtype=np.int64),
        case["block_size"],
    ).to_pandas()
    return pd.DataFrame(pdf), postings


def _oracle(postings, idf, qterms, case):
    """Brute-force per-query ranking with the kernel's exact contract:
    filters first, float64 accumulation, emit-dtype (or rounded-value)
    ranking, (score desc, docid asc) tie-break."""
    tomb = set(case["tomb"].tolist()) if case["tomb"] is not None else None
    allowed = set(case["allowed"].tolist()) if case["allowed"] is not None else None
    acc: dict[int, float] = {}
    for t in qterms:
        for d, tf, dl in postings.get(t, []):
            if tomb is not None and d in tomb:
                continue
            if allowed is not None and d not in allowed:
                continue
            acc[d] = acc.get(d, 0.0) + idf[t] * float(
                tfn_np(float(tf), float(dl), case["avgdl"], PARAMS)
            )
    if case["round_to"] is not None:
        emit = {d: round(s, case["round_to"]) for d, s in acc.items()}
    else:
        emit = {d: float(np.float32(s)) for d, s in acc.items()}
    order = sorted(emit.items(), key=lambda kv: (-kv[1], kv[0]))[: case["k"]]
    return order


@settings(max_examples=120, derandomize=True, deadline=None)
@given(shard_case())
def test_cascade_exhaustive_oracle_agree(case):
    pdf, postings = _encode(case)
    idf = {t: float(idf_np(len(p), N_GLOBAL)) for t, p in postings.items()}
    outs = {}
    for mode in ("exhaustive", "cascade"):
        out = score_shard(
            pdf,
            case["queries"],
            idf,
            case["avgdl"],
            case["k"],
            PARAMS,
            mode=mode,
            tombstones=case["tomb"],
            allowed=case["allowed"],
            round_to=case["round_to"],
            shard_size=case["shard_size"],
        )
        outs[mode] = {
            qid: [(int(r.docid), float(r.score)) for r in g.itertuples()]
            for qid, g in out.groupby("query_id")
        }
    for qid, qterms in case["queries"].items():
        want = _oracle(postings, idf, qterms, case)
        for mode in ("exhaustive", "cascade"):
            got = outs[mode].get(qid, [])
            assert [d for d, _ in got] == [d for d, _ in want], (
                mode,
                qid,
                got,
                want,
                case["round_to"],
            )
            np.testing.assert_allclose(
                [s for _, s in got], [s for _, s in want], rtol=1e-6,
                err_msg=f"{mode} qid={qid}",
            )
