"""ANN quality gate: the LSH/IVF path must have a *measured* recall
and a working accuracy/probe knob (the reference's ``n_ivf_probe``
trade, ``plaid.py:40-64,126-132``) — an approximate operator without a
recall number is unusable at scale.

Clustered synthetic embeddings (deterministic) stand in for real text
embeddings; everything here is seeded, so the asserted floors are
stable, not flaky.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylate_spark.operators.similarity import cosine_topk, ivf_topk, recall_at_k
from pylate_spark.sources.synth import synth_embeddings

K = 10
N_PLANES = 6


@pytest.fixture(scope="module")
def emb(spark):
    return synth_embeddings(spark, 2000).cache()


@pytest.fixture(scope="module")
def queries(spark, emb):
    return emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    ).cache()


@pytest.fixture(scope="module")
def exact(spark, emb, queries):
    return cosine_topk(emb, queries, k=K).cache()


def _mean_recall(exact_df, approx_df):
    rows = recall_at_k(exact_df, approx_df, k=K).collect()
    assert len(rows) == 20
    return sum(r["recall"] for r in rows) / len(rows)


def test_multiprobe_recall_floor(spark, emb, queries, exact):
    approx = ivf_topk(emb, queries, k=K, n_planes=N_PLANES, n_probe=22)
    assert _mean_recall(exact, approx) >= 0.90


def test_probe_knob_is_monotone(spark, emb, queries, exact):
    r = {
        p: _mean_recall(exact, ivf_topk(emb, queries, k=K, n_planes=N_PLANES, n_probe=p))
        for p in (1, 7, 22)
    }
    assert r[1] <= r[7] <= r[22], r
    assert r[1] >= 0.3  # single-bucket probe is not vacuous either
