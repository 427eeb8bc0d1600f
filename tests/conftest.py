"""Shared test fixtures.

One session-scoped SparkSession (local, small shuffle width), plus the
deterministic t1/t2 corpora from FIXTURES.md §1.2.
"""

from __future__ import annotations

import pytest

from pylate_spark.session import get_spark
from pylate_spark.sources.synth import synth_pages_pandas, synth_queries_pandas


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pylate_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_t1(spark):
    """t1 smoke corpus: 200 docs."""
    return spark.createDataFrame(synth_pages_pandas(200)).cache()


@pytest.fixture(scope="session")
def pages_t1_pdf():
    return synth_pages_pandas(200)


@pytest.fixture(scope="session")
def queries_pdf():
    return synth_queries_pandas(40)


@pytest.fixture(scope="session")
def pages_t2_pdf():
    """t2 correctness corpus: 2000 docs (kept below FIXTURES' 5000 for
    suite runtime; scaled up in the bench)."""
    return synth_pages_pandas(2000)


@pytest.fixture(scope="session")
def pages_t2(spark, pages_t2_pdf):
    return spark.createDataFrame(pages_t2_pdf).cache()
