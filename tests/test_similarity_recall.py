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


def test_target_recall_auto_probe(spark, emb, queries, exact):
    """target_recall picks n_probe from the measured curve: asking for
    0.9 must ACHIEVE >= 0.9 (on the calibration distribution), and the
    curve's full-coverage anchor (2^n_planes probes = every bucket =
    exact) guarantees any feasible target is reachable."""
    from pylate_spark.operators.similarity import (
        choose_n_probe,
        ivf_topk_auto,
        probe_recall_curve,
    )

    curve = probe_recall_curve(emb, queries, k=K, n_planes=N_PLANES)
    # monotone-ish and anchored: full coverage is exact by construction
    assert curve[-1]["n_probe"] == 2**N_PLANES and curve[-1]["recall"] == 1.0, curve

    approx, n_probe = ivf_topk_auto(
        emb, queries, target_recall=0.90, k=K, n_planes=N_PLANES, curve=curve
    )
    assert n_probe == choose_n_probe(curve, 0.90, n_planes=N_PLANES)
    assert n_probe < 2**N_PLANES  # 0.9 is reachable without a full scan here
    assert _mean_recall(exact, approx) >= 0.90

    # self-calibrating path (no persisted curve): calibrates on a query
    # sample, then returns the chosen operating point
    approx2, p2 = ivf_topk_auto(
        emb, queries, target_recall=0.90, k=K, n_planes=N_PLANES, calibration_queries=20
    )
    assert _mean_recall(exact, approx2) >= 0.90
    assert 1 <= p2 <= 2**N_PLANES
