"""Pure-python/numpy BM25 oracle — the engine-independent reference
implementation every Spark query path must match rank-identically
(docids and float32 scores).

This is the analog of the reference's legacy-equivalence testing
pattern (``/root/reference/tests/test_colbert_scores.py:53-84``, where
the new scorer is asserted equal to an older independent
implementation) combined with its golden end-to-end retrieval tests
(``tests/test_retriever.py:6-80``).

Determinism contract (FIXTURES.md §5):
- tokens = ``tokenize_py(text)`` (the engine-default definition)
- N / avgdl over documents with >= 1 token
- idf = ln((N - df + 0.5) / (df + 0.5) + 1)
- distinct query terms (set semantics), accumulated in sorted term
  order, float64 accumulation in docid order, float32 emit
- ranking: score desc, docid asc; top-k
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from pylate_spark.config import BM25Params
from pylate_spark.functions.bm25 import idf_np, tfn_np
from pylate_spark.functions.tokenize import tokenize_py


class OracleIndex:
    """Dict-based inverted index + exhaustive BM25."""

    def __init__(self, docs: list[tuple[int, str]], params: BM25Params = BM25Params()):
        self.params = params
        self.postings: dict[str, list[tuple[int, int]]] = {}
        self.dl: dict[int, int] = {}
        for docid, text in sorted(docs):
            toks = tokenize_py(text)
            if not toks:
                continue
            self.dl[docid] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                self.postings.setdefault(term, []).append((docid, tf))
        self.n_docs = len(self.dl)
        self.avgdl = float(np.mean(list(self.dl.values()))) if self.dl else 0.0

    def delete(self, docids: set[int]) -> None:
        """Tombstone-style delete (no renumbering; stats recomputed) —
        semantics of ``IndexUpdater.remove``
        (``/root/reference/pylate/indexes/stanford_nlp/index_updater.py:52-69``)."""
        for term in list(self.postings):
            kept = [(d, tf) for d, tf in self.postings[term] if d not in docids]
            if kept:
                self.postings[term] = kept
            else:
                del self.postings[term]
        for d in docids:
            self.dl.pop(d, None)
        self.n_docs = len(self.dl)
        self.avgdl = float(np.mean(list(self.dl.values()))) if self.dl else 0.0

    def add(self, docs: list[tuple[int, str]]) -> None:
        for docid, text in sorted(docs):
            toks = tokenize_py(text)
            if not toks:
                continue
            self.dl[docid] = len(toks)
            for term, tf in sorted(Counter(toks).items()):
                lst = self.postings.setdefault(term, [])
                lst.append((docid, tf))
                lst.sort()
        self.n_docs = len(self.dl)
        self.avgdl = float(np.mean(list(self.dl.values()))) if self.dl else 0.0

    def search(
        self, query: str, k: int = 10, allowed: set[int] | None = None
    ) -> list[tuple[int, float]]:
        """Top-k (docid, float32 score), score desc / docid asc."""
        terms = sorted(set(tokenize_py(query)))
        acc: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = float(idf_np(len(plist), self.n_docs))
            for docid, tf in plist:  # docid-ascending accumulation
                if allowed is not None and docid not in allowed:
                    continue
                acc[docid] = acc.get(docid, 0.0) + idf * float(
                    tfn_np(float(tf), float(self.dl[docid]), self.avgdl, self.params)
                )
        scored = [(d, np.float32(s)) for d, s in acc.items()]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return [(d, float(s)) for d, s in scored[:k]]

    def search_all(
        self, queries: list[tuple[int, str]], k: int = 10, allowed: set[int] | None = None
    ) -> list[tuple[int, int, int, float]]:
        """Flattened ranked results ``(query_id, rank, docid, score)``."""
        out = []
        for qid, text in queries:
            for rank, (docid, score) in enumerate(self.search(text, k=k, allowed=allowed), 1):
                out.append((qid, rank, docid, score))
        return out
