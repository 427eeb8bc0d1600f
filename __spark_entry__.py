"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship BM25 top-k over the sf0.001 ``documents``
table; ``queries``/``oracle_sql`` expose the full operator catalog from
``pylate_spark.entry_queries`` (each Spark implementation paired with
an exactly-equivalent DuckDB SQL oracle where SQL can express it —
approximate/LSH and the float32 indexed path are rows-only by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 for the
    fixed reference query set over the documents table."""
    from pylate_spark.entry_queries import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pylate_spark.entry_queries import catalog

    return {name: fn for name, (fn, _) in catalog().items()}


def oracle_sql() -> dict[str, str]:
    from pylate_spark.entry_queries import catalog

    return {name: sql for name, (_, sql) in catalog().items() if sql is not None}
