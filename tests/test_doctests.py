"""Doctests-as-specs — the reference runs every docstring example as an
executable spec (``--doctest-modules``, pyproject.toml:105). We scope it
to the pure-function modules (Spark-free)."""

import doctest

import pylate_spark.functions.bm25 as bm25_mod


def test_bm25_doctests():
    results = doctest.testmod(bm25_mod, optionflags=doctest.ELLIPSIS, verbose=False)
    assert results.attempted >= 5
    assert results.failed == 0
