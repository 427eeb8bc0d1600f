"""Retrieval-quality metrics as DataFrame operators.

The reference delegates metric computation to ``ranx``
(``/root/reference/pylate/evaluation/beir.py:186-207``, defaults
``ndcg@10`` + ``hits@{1..10}``); here the same definitions are native
column expressions over a ``(query_id, rank, docid, score)`` results
table joined with ``(query_id, docid, relevance)`` qrels — so quality
evaluation itself distributes across the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ndcg_at_k(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query nDCG@k.

    DCG  = Σ_{rank<=k, hit} (2^rel - 1) / log2(rank + 1)
    IDCG = the same over the query's relevance values sorted descending
    (standard exponential-gain formulation, as ranx computes it).
    Returns (query_id, ndcg double).
    """
    hits = (
        results.where(F.col("rank") <= k)
        .join(qrels, ["query_id", "docid"], "inner")
        .withColumn("gain", (F.pow(F.lit(2.0), F.col("relevance")) - 1) / F.log2(F.col("rank") + 1))
    )
    dcg = hits.groupBy("query_id").agg(F.sum("gain").alias("dcg"))

    w = Window.partitionBy("query_id").orderBy(F.desc("relevance"), F.asc("docid"))
    ideal = (
        qrels.withColumn("irank", F.row_number().over(w))
        .where(F.col("irank") <= k)
        .withColumn(
            "igain", (F.pow(F.lit(2.0), F.col("relevance")) - 1) / F.log2(F.col("irank") + 1)
        )
        .groupBy("query_id")
        .agg(F.sum("igain").alias("idcg"))
    )
    return (
        ideal.join(dcg, "query_id", "left")
        .select(
            "query_id",
            # idcg = 0 (a query whose qrels are all relevance 0) is
            # defined as ndcg 0, not null/NaN — ranx's convention
            F.when(F.col("idcg") > 0,
                   F.round(F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"), 6))
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def _found_at_k(results: DataFrame, qrels: DataFrame, k: int):
    """(per-query relevant count, per-query relevant-found-in-top-k
    count) — shared by hits@k and recall@k."""
    rel = qrels.where(F.col("relevance") > 0)
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    found = (
        results.where(F.col("rank") <= k)
        .join(rel, ["query_id", "docid"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_found"))
    )
    return n_rel, found


def hits_at_k(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query hits@k: the NUMBER of relevant docs retrieved in the
    top k — ranx's hits@k, the reference's ``hits@1..10`` family
    (``/root/reference/pylate/evaluation/beir.py:186-207``). For the
    fraction, use :func:`recall_at_k`."""
    n_rel, found = _found_at_k(results, qrels, k)
    return n_rel.join(found, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_found"), F.lit(0)).cast("long").alias("hits"),
    )


def recall_at_k(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query recall@k: fraction of the query's relevant docs
    retrieved in the top k."""
    n_rel, found = _found_at_k(results, qrels, k)
    return n_rel.join(found, "query_id", "left").select(
        "query_id",
        F.round(F.coalesce(F.col("n_found"), F.lit(0)) / F.col("n_rel"), 6).alias("recall"),
    )
