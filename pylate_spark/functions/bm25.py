"""BM25 scoring math, in three forms that must agree bit-for-bit:

1. native Spark column expressions (:func:`bm25_score_col`) — JVM-side,
   whole-stage-codegen'd, used by the pure-DataFrame exhaustive path;
2. numpy (:func:`idf_np`, :func:`tfn_np`) — used inside the pandas-UDF
   query kernels (block-max cascade) and the oracle;
3. the ANSI-SQL snippet builder (:func:`bm25_sql_expr`) — used by the
   DuckDB oracle queries in ``__spark_entry__.py``.

This triple-agreement discipline is the analog of the reference's
legacy-equivalence test (``tests/test_colbert_scores.py:53-84``: new
scorer must match the old implementation exactly).

Formula (Lucene-style non-negative idf; BASELINE.json k1=1.2 b=0.75):

    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    tfn(tf, dl) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q, d) = sum over *distinct* query terms of idf * tfn

Query terms are deduplicated (set semantics, as Lucene's default —
query tf has no weight); this is the documented divergence from a
hypothetical query-tf-weighted variant, covered by the "duplicated
term in query" fixture case.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from pylate_spark.config import BM25Params

__all__ = ["idf_np", "tfn_np", "bm25_score_col", "bm25_sql_expr"]


def idf_np(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    """Lucene-style non-negative idf.

    Golden values (doctest-as-spec, the reference's discipline —
    e.g. ``pylate/scores/colbert.py:54-64``):

    >>> round(float(idf_np(1, 100)), 6)
    4.209655
    >>> round(float(idf_np(100, 100)), 6)
    0.004963
    >>> float(idf_np(0, 0))  # degenerate corpus: still finite
    0.693147180559945...
    """
    return np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def tfn_np(
    tf: np.ndarray | float,
    dl: np.ndarray | float,
    avgdl: float,
    params: BM25Params = BM25Params(),
) -> np.ndarray | float:
    """BM25 tf normalization.

    >>> round(float(tfn_np(1.0, 100.0, 100.0)), 6)   # dl == avgdl
    1.0
    >>> round(float(tfn_np(3.0, 50.0, 100.0)), 6)    # short doc boosted
    1.76
    >>> float(tfn_np(1000.0, 100.0, 100.0)) < 2.2    # saturates at k1+1
    True
    """
    return tf * (params.k1 + 1.0) / (tf + params.k1 * (1.0 - params.b + params.b * dl / avgdl))


def bm25_score_col(
    tf: Column, dl: Column, df: Column, n_docs: Column | float, avgdl: Column | float,
    params: BM25Params = BM25Params(),
) -> Column:
    """Per-(term, doc) BM25 contribution as a native column expression
    (float64 throughout; caller sums per (query, doc) and casts to
    float32 at emit)."""
    n = F.lit(float(n_docs)) if isinstance(n_docs, (int, float)) else n_docs
    ad = F.lit(float(avgdl)) if isinstance(avgdl, (int, float)) else avgdl
    idf = F.log((n - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
    tfd = tf.cast("double")
    dld = dl.cast("double")
    tfn = tfd * F.lit(params.k1 + 1.0) / (
        tfd + F.lit(params.k1) * (F.lit(1.0 - params.b) + F.lit(params.b) * dld / ad)
    )
    return idf * tfn


def bm25_sql_expr(
    tf: str, dl: str, df: str, n_docs: str, avgdl: str, params: BM25Params = BM25Params()
) -> str:
    """The same formula as ANSI SQL text (DuckDB-compatible), for the
    driver's oracle comparison."""
    k1, b = params.k1, params.b
    idf = f"ln(({n_docs} - {df} + 0.5) / ({df} + 0.5) + 1.0)"
    tfn = f"({tf} * {k1 + 1.0}) / ({tf} + {k1} * ({1.0 - b} + {b} * {dl} / {avgdl}))"
    return f"({idf}) * ({tfn})"
