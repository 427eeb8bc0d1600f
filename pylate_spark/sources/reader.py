"""Source-format boundary: one place where table locations become
DataFrames.

The BASELINE.json north star reads "Iceberg table of Common-Crawl-style
web pages"; this sandbox has no Iceberg runtime jars or catalog, so the
engine's own storage stays parquet + manifest (functionally the same
commit discipline: versioned dirs + atomic pointer flips, see
``pylate_spark/storage.py``). What must NOT be hard-coded is the
*input* side — on a cluster deployment the corpus arrives as an Iceberg
(or Delta/Hudi/ORC/...) table, and that has to be a configuration
change, not a code change. Every scripted entry point (bench, eval,
scaling, the driver catalog) therefore reads its inputs through
:func:`read_table`:

- ``format=None``/``"parquet"``  → ``spark.read.parquet(location)``
- ``format="table"``             → ``spark.table(location)`` — any
  catalog-registered table, which is exactly how Iceberg tables are
  addressed on a real deployment (``spark.table("cat.db.pages")`` with
  the Iceberg catalog configured via ``spark.sql.catalog.*`` conf at
  spark-submit time; no engine code involved)
- any other name                 → ``spark.read.format(name).load()``
  — the DataSourceV2 escape hatch (``format="iceberg"`` path-based
  reads, ``"orc"``, ``"json"``, a custom source, ...)

The default comes from ``$PYLATE_SPARK_FORMAT`` so an Iceberg
deployment is literally an env var + the usual ``--packages``/catalog
conf on spark-submit. Downstream of this function everything is a plain
DataFrame — build_index and all operators take DataFrames, never paths,
so they are format-agnostic by construction (the reference's analogous
seam is the dataset loader split from the indexer,
``pylate/evaluation/beir.py:37-87`` vs ``indexes/fast_plaid.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_table(
    spark: SparkSession,
    location: str,
    format: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read a corpus table by location/identifier through the configured
    datasource (see module docstring). ``format`` falls back to
    ``$PYLATE_SPARK_FORMAT``, then parquet."""
    fmt = format or os.environ.get("PYLATE_SPARK_FORMAT") or "parquet"
    if fmt == "table":
        return spark.table(location)
    reader = spark.read.options(**(options or {}))
    if fmt == "parquet":
        return reader.parquet(location)
    return reader.format(fmt).load(location)
