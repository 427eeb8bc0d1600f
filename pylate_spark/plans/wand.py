"""Per-shard BM25 scoring kernels: exhaustive and block-max cascade.

The cascade is the engine's analog of the reference's staged pruning
(``/root/reference/pylate/indexes/stanford_nlp/search/index_storage.py:129-244``:
centroid upper-bound threshold → shrinking top-``ndocs`` →
exact rescoring of survivors). We implement the WAND-family
**block-max MaxScore** strategy rather than document-at-a-time WAND:
DAAT pivoting is a per-document Python loop (forbidden hot path);
MaxScore needs only a loop over *query terms*, with every per-posting
operation vectorized, and exploits the same per-block metadata
(``max_tf``/``min_dl`` → true score upper bounds) to skip decoding
blocks that cannot contain a top-k document.

Soundness argument (exactness — required for rank-identity):
- Terms are processed in descending upper-bound order. After the OR
  phase prefix S, any document not yet in the accumulator can score at
  most ``suffix_ub = Σ_{t∉S} UB_t``. We switch to AND mode only when
  ``suffix_ub < θ`` where θ = k-th largest *partial* (hence ≤ final)
  accumulator score — so no unseen document can enter the top k.
- In AND mode, remaining terms are scored only at accumulator docids;
  only blocks whose [first, last] docid range contains an accumulator
  docid are decoded (binary search on block boundaries — the
  block-skip). Every accumulator doc still receives its exact full
  score, so the final top-k and scores are exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pylate_spark.config import BM25Params
from pylate_spark.functions.bm25 import tfn_np
from pylate_spark.functions.codec import decode_postings
from pylate_spark.plans.segments import blocks_from_row

RESULT_COLUMNS = ["query_id", "docid", "score"]


def choose_mode(n_terms: int, k: int) -> str:
    """Per-query strategy selection — the analog of the reference's
    k-banded parameter presets (``stanford_nlp/searcher.py:60-83``,
    which widens ncells/ndocs as k grows and falls back to exact
    scoring for large k).

    - 1 query term: pruning is impossible (suffix bound is 0 after the
      only term), so skip the cascade bookkeeping entirely.
    - large k (>=256): θ (the k-th best partial score) stays low for
      most of the term list, the OR→AND switch fires late or never, and
      the cascade degenerates to exhaustive plus overhead.
    - otherwise: block-max MaxScore cascade.
    """
    if n_terms <= 1 or k >= 256:
        return "exhaustive"
    return "cascade"


def _merge_sorted(
    acc_d: np.ndarray, acc_s: np.ndarray, docids: np.ndarray, contrib: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Merge one term's docid-sorted (docids, contrib) run into the
    sorted accumulator WITHOUT re-sorting (``np.searchsorted`` + masked
    scatter). This replaces the round-1 per-term ``np.unique`` over the
    whole concatenation — O((A+B)·log(A+B)) sort per term — with
    O(A + B·log A), which is what makes the OR phase no slower than the
    exhaustive scorer even when pruning never fires.

    ``acc_s`` is mutated in place for already-present docids; callers
    must own it (first merge copies the cached contrib array)."""
    if acc_d.size == 0:
        return docids, contrib.astype(np.float64)
    pos = np.searchsorted(acc_d, docids)
    hit = np.zeros(docids.size, dtype=bool)
    inb = pos < acc_d.size
    hit[inb] = acc_d[pos[inb]] == docids[inb]
    # docids are unique within a term and acc_d is unique → pos[hit] has
    # no duplicates, so plain fancy-index += is exact
    acc_s[pos[hit]] += contrib[hit]
    if hit.all():
        return acc_d, acc_s
    new_d = docids[~hit]
    new_s = contrib[~hit]
    ins = np.searchsorted(acc_d, new_d) + np.arange(new_d.size)
    out_d = np.empty(acc_d.size + new_d.size, dtype=np.int64)
    out_s = np.empty(out_d.size, dtype=np.float64)
    keep = np.ones(out_d.size, dtype=bool)
    keep[ins] = False
    out_d[ins] = new_d
    out_s[ins] = new_s
    out_d[keep] = acc_d
    out_s[keep] = acc_s
    return out_d, out_s


def _topk(docids: np.ndarray, scores32: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, docid asc) — deterministic tie-break."""
    if docids.size == 0:
        return docids, scores32
    if docids.size > k:
        # k-th largest score value, then keep everything >= it so that
        # boundary ties survive for the deterministic docid tie-break
        th = np.partition(scores32, docids.size - k)[docids.size - k]
        mask = scores32 >= th
        docids, scores32 = docids[mask], scores32[mask]
    order = np.lexsort((docids, -scores32))[:k]
    return docids[order], scores32[order]


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership mask of ``values`` in a SORTED array — O(V·log S)
    binary search instead of ``np.isin``'s O((V+S)·log(V+S)) sort."""
    pos = np.searchsorted(sorted_arr, values)
    mask = np.zeros(values.size, dtype=bool)
    inb = pos < sorted_arr.size
    mask[inb] = sorted_arr[pos[inb]] == values[inb]
    return mask


class ShardTerms:
    """Decoded-on-demand view of one shard's matched segment rows."""

    def __init__(
        self,
        pdf: pd.DataFrame,
        tombstones: np.ndarray | None,
        allowed: np.ndarray | None,
        batch_queries: int = 1,
    ):
        # column-array extraction, not iterrows: building a pandas
        # Series per row was ~30% of single-shard kernel time
        cols = ("term", "payload", "b_first", "b_last", "b_n", "b_max_tf", "b_min_dl", "b_off")
        arrs = {c: pdf[c].to_numpy(object) for c in cols}
        terms_arr = arrs["term"]
        self.rows = {
            terms_arr[i]: {c: arrs[c][i] for c in cols} for i in range(len(pdf))
        }
        self.blocks = {t: blocks_from_row(r) for t, r in self.rows.items()}
        self._full: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        self._contrib: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._probes: dict[str, int] = {}
        self._ub: dict[str, float] = {}
        self.tombstones = tombstones
        self.allowed = allowed
        # with many queries in the batch, a term will almost surely be
        # probed again — decode it fully once and share, instead of
        # paying repeated selective block decodes (see contrib_at)
        self.batch_amortized = batch_queries > 8

    def terms(self):
        return self.rows.keys()

    def _mask(self, docids, tfs, dls):
        if self.tombstones is not None and self.tombstones.size:
            keep = ~_in_sorted(docids, self.tombstones)
            docids, tfs, dls = docids[keep], tfs[keep], dls[keep]
        if self.allowed is not None:
            keep = _in_sorted(docids, self.allowed)
            docids, tfs, dls = docids[keep], tfs[keep], dls[keep]
        return docids, tfs, dls

    def full(self, term: str):
        """Decode (and cache) a term's full postings for this shard."""
        if term not in self._full:
            r = self.rows[term]
            out = decode_postings(r["payload"], self.blocks[term])
            self._full[term] = self._mask(*out)
        return self._full[term]

    def contrib(self, term: str, idf: float, avgdl: float, params) -> tuple[np.ndarray, np.ndarray]:
        """(docids, idf·tfn contributions), cached — shared across all
        queries in the batch (a head term's scores are computed once
        per shard, not once per query)."""
        if term not in self._contrib:
            docids, tfs, dls = self.full(term)
            self._contrib[term] = (
                docids,
                idf * tfn_np(tfs.astype(np.float64), dls.astype(np.float64), avgdl, params),
            )
        return self._contrib[term]

    def contrib_at(self, term: str, cand: np.ndarray, idf_t: float, avgdl: float, params):
        """(docids, contributions) restricted to candidate docids.

        Batch amortization: the first probe of a term decodes only the
        blocks whose docid range intersects ``cand`` (the single-query
        block-skip win); a term probed a *second* time in the same
        batch — or one already fully scored for another query's OR
        phase — reuses the full cached contributions (no decode, no
        tfn). With many queries per scatter, repeated partial decodes
        of the same head term would otherwise dominate the AND phase
        (measured: ~2× kernel time without this)."""
        probes = self._probes.get(term, 0)
        self._probes[term] = probes + 1
        if self.batch_amortized or term in self._contrib or term in self._full or probes >= 1:
            d_full, c_full = self.contrib(term, idf_t, avgdl, params)
            keep = _in_sorted(d_full, cand)
            return d_full[keep], c_full[keep]
        b = self.blocks[term]
        lo = np.searchsorted(cand, b.first, side="left")
        hi = np.searchsorted(cand, b.last, side="right")
        need = np.flatnonzero(hi > lo)
        self.blocks_skipped = getattr(self, "blocks_skipped", 0) + (b.first.size - need.size)
        docids, tfs, dls = decode_postings(self.rows[term]["payload"], self.blocks[term], select=need)
        docids, tfs, dls = self._mask(docids, tfs, dls)
        keep = _in_sorted(docids, cand)
        docids, tfs, dls = docids[keep], tfs[keep], dls[keep]
        return docids, idf_t * tfn_np(tfs.astype(np.float64), dls.astype(np.float64), avgdl, params)

    def shard_ub_inputs(self, term: str) -> tuple[int, int]:
        """(max_tf, min_dl) over this shard's blocks — upper-bound inputs."""
        b = self.blocks[term]
        return int(b.max_tf.max()), int(b.min_dl.min())

    def upper_bound(self, term: str, idf_t: float, avgdl: float, params) -> float:
        """Shard-local true score upper bound for a term — cached, it is
        query-independent (idf is global, block stats are per shard)."""
        ub = self._ub.get(term)
        if ub is None:
            max_tf, min_dl = self.shard_ub_inputs(term)
            ub = idf_t * float(tfn_np(float(max_tf), float(min_dl), avgdl, params))
            self._ub[term] = ub
        return ub


def score_shard(
    pdf: pd.DataFrame,
    queries: dict[int, list[str]],
    idf: dict[str, float],
    avgdl: float,
    k: int,
    params: BM25Params,
    mode: str = "auto",
    tombstones: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
    round_to: int | None = None,
) -> pd.DataFrame:
    """Score all queries against one shard's matched segment rows.

    Returns per-shard top-k rows (query_id, docid, score). The score is
    float32 by default; with ``round_to`` set it is float64 rounded to
    that many decimals *before* top-k selection, so boundary ties
    resolve exactly as an engine ranking by the rounded value (the
    cross-engine determinism contract of the DuckDB oracles).

    ``mode="auto"`` picks cascade/exhaustive per query via
    :func:`choose_mode` (the reference's per-k parameter bands).
    """
    st = ShardTerms(pdf, tombstones, allowed, batch_queries=len(queries))
    have = set(st.terms())
    out_q, out_d, out_s = [], [], []
    for qid, qterms in queries.items():
        terms = [t for t in qterms if t in have]
        if not terms:
            continue
        qmode = choose_mode(len(terms), k) if mode == "auto" else mode
        if qmode == "exhaustive":
            docids, scores = _score_exhaustive(st, terms, idf, avgdl, params)
        else:
            docids, scores = _score_cascade(st, terms, idf, avgdl, k, params)
        # round_to: select top-k on the rounded float64 value (matching
        # an engine that ranks by the rounded score); default: select on
        # float32 (the emitted dtype), so boundary ties match the emit
        if round_to is not None:
            scores = np.round(scores.astype(np.float64), round_to)
        else:
            scores = scores.astype(np.float32)
        d, s = _topk(docids, scores, k)
        out_q.append(np.full(d.size, qid, dtype=np.int64))
        out_d.append(d)
        out_s.append(s)
    dt = np.float64 if round_to is not None else np.float32
    if not out_q:
        return _empty_result(dt)
    return pd.DataFrame(
        {
            "query_id": np.concatenate(out_q),
            "docid": np.concatenate(out_d),
            "score": np.concatenate(out_s).astype(dt),
        }
    )


def _empty_result(score_dtype=np.float32) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "query_id": pd.Series(dtype=np.int64),
            "docid": pd.Series(dtype=np.int64),
            "score": pd.Series(dtype=score_dtype),
        }
    )


def _score_exhaustive(st: ShardTerms, terms, idf, avgdl, params):
    """No-pruning scorer — the in-engine correctness oracle (kept
    per-query on purpose: a batched-across-queries variant was tried
    and re-scores each head term's full posting run once per query
    containing it, which is exactly the blow-up the cascade's pruning
    exists to avoid)."""
    all_d, all_s = [], []
    for t in terms:
        docids, contrib = st.contrib(t, idf[t], avgdl, params)
        if docids.size == 0:
            continue
        all_d.append(docids)
        all_s.append(contrib)
    if not all_d:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
    cat_d = np.concatenate(all_d)
    cat_s = np.concatenate(all_s)
    uniq, inv = np.unique(cat_d, return_inverse=True)
    sums = np.bincount(inv, weights=cat_s)
    return uniq, sums  # float64; caller picks the emit dtype


def _score_cascade(st: ShardTerms, terms, idf, avgdl, k, params):
    """Block-max MaxScore (see module docstring for the soundness
    argument). Falls back to exhaustive behavior when the accumulator
    never reaches k docs (then the OR phase simply runs to the end)."""
    # shard-local true upper bounds per term (cached across the batch)
    ubs = [st.upper_bound(t, idf[t], avgdl, params) for t in terms]
    order = np.argsort(-np.asarray(ubs), kind="stable")
    terms = [terms[i] for i in order]
    ubs = [ubs[i] for i in order]
    suffix = np.concatenate([np.cumsum(np.asarray(ubs, dtype=np.float64)[::-1])[::-1], [0.0]])

    acc_d = np.empty(0, dtype=np.int64)   # sorted docids
    acc_s = np.empty(0, dtype=np.float64)
    i = 0
    for i, t in enumerate(terms):
        # switch to AND mode when unseen docs can no longer enter top-k
        if acc_d.size >= k:
            theta = np.partition(acc_s, acc_s.size - k)[acc_s.size - k]
            if suffix[i] < theta:
                break
        docids, contrib = st.contrib(t, idf[t], avgdl, params)
        if docids.size:
            acc_d, acc_s = _merge_sorted(acc_d, acc_s, docids, contrib)
    else:
        i = len(terms)  # OR phase consumed everything

    # AND phase: remaining terms scored only at accumulator docids,
    # decoding only blocks that can contain them
    for j in range(i, len(terms)):
        t = terms[j]
        if acc_d.size == 0:
            break
        # prune accumulators that can no longer reach the top-k
        if acc_d.size > k:
            theta = np.partition(acc_s, acc_s.size - k)[acc_s.size - k]
            keep = acc_s + suffix[j] >= theta
            acc_d, acc_s = acc_d[keep], acc_s[keep]
        docids, contrib = st.contrib_at(t, acc_d, idf[t], avgdl, params)
        if docids.size:
            pos = np.searchsorted(acc_d, docids)
            np.add.at(acc_s, pos, contrib)
    return acc_d, acc_s  # float64; caller picks the emit dtype
