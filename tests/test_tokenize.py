"""Tokenizer equivalence: pandas UDF == pure python == native
regexp_extract_all — the byte-identical invariant carrier
(BASELINE.json input_hint; reference analog: deterministic encode,
``models/colbert.py:1086-1144``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pylate_spark.functions.tokenize import (
    native_tokens_col,
    terms_long,
    tokenize_py,
    tokenize_udf,
)


def test_tokenize_py_golden():
    assert tokenize_py("The quick, BROWN fox-42!") == ["the", "quick", "brown", "fox", "42"]
    assert tokenize_py("") == []
    assert tokenize_py("...!!!") == []


def test_udf_matches_python_and_native(spark, pages_t1):
    sample = pages_t1.limit(50)
    out = sample.select(
        "url",
        "text",
        tokenize_udf(F.col("text")).alias("udf_tokens"),
        native_tokens_col("text").alias("native_tokens"),
    ).collect()
    for r in out:
        py = tokenize_py(r["text"])
        assert list(r["udf_tokens"]) == py
        assert list(r["native_tokens"]) == py


def test_terms_long_counts(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"docid": [1, 2], "text": ["a b a c", "b b b"]})
    )
    rows = {(r["docid"], r["term"]): (r["tf"], r["dl"]) for r in terms_long(docs).collect()}
    assert rows == {
        (1, "a"): (2, 4),
        (1, "b"): (1, 4),
        (1, "c"): (1, 4),
        (2, "b"): (3, 3),
    }
