"""Unicode token-definition tests: the tri-engine agreement property
(Python ``re`` / Spark / DuckDB must tokenize identically — the
invariant the DuckDB oracles rest on), the case-fold repairs, and
end-to-end searchability of non-Latin documents.

Reference bar: the HF subword tokenizer handles every script
(``/root/reference/pylate/models/colbert.py:1086-1144``); our explicit
range allowlist covers the major Common-Crawl scripts and is pinned
here so a regex/locale/library drift in any engine fails loudly.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pylate_spark.config import BM25Params, IndexConfig
from pylate_spark.functions.tokenize import (
    ASCII_TOKEN_PATTERN,
    TOKEN_PATTERN,
    UNICODE_TOKEN_PATTERN,
    make_tokenize_udf,
    native_tokens_col,
    token_sql,
    tokenize_py,
)

# characters spanning every range family plus the known engine
# divergence triggers (word-final Σ, dotted İ, ẞ, Kelvin sign, micro
# sign, combining dot, math symbols excluded from the ranges)
_ALPHABET = (
    "abcz059 .,!?-_'\"\n\t"
    "ÀÖØäöü×÷ß"
    "ĀſƿǄǅǆ"
    "ΑΒΣΩασςω"
    "АЯЁаяё"
    "ԱՖաֆև"
    "אבת"
    "ابيغف٠٩"
    "कखահिीं०९"
    "กขฯ๐๙"
    "აბჰ"
    "ẠạỸỹ"
    "ぁあんゖァアヺー"
    "一丁鿐龥"
    "가힣"
    "İıẞKKµ̇—€"
)

_texts = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@settings(
    max_examples=300,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(text=_texts)
def test_python_duckdb_tokenize_agree(duck, text):
    """Property: the DuckDB oracle expression tokenizes EXACTLY like
    tokenize_py for any text over the covered scripts (incl. the Σ/İ
    case-fold traps and excluded chars)."""
    got = duck.execute(f"SELECT {token_sql('?::VARCHAR')}", [text]).fetchone()[0]
    assert list(got) == tokenize_py(text)


def test_spark_native_and_pandas_agree_with_python(spark):
    """Bulk tri-form check on Spark: native (Java regex + translate
    fold) and pandas-UDF twins must both equal tokenize_py over a
    seeded sweep of the same alphabet (one job, 400 texts)."""
    rng = np.random.Generator(np.random.Philox(key=99, counter=0))
    chars = np.array(list(_ALPHABET), dtype=object)
    texts = [
        "".join(chars[rng.integers(0, len(chars), int(rng.integers(0, 60)))])
        for _ in range(400)
    ]
    udf = make_tokenize_udf()
    rows = (
        spark.createDataFrame(pd.DataFrame({"text": texts}))
        .select(
            "text",
            native_tokens_col("text").alias("nat"),
            udf(F.col("text")).alias("pdt"),
        )
        .collect()
    )
    assert len(rows) == 400
    for r in rows:
        want = tokenize_py(r["text"])
        assert list(r["nat"]) == want, repr(r["text"])
        assert list(r["pdt"]) == want, repr(r["text"])


def test_case_fold_repairs_golden():
    # word-final uppercase sigma: all engines must emit σ
    assert tokenize_py("ΑΣ ΒΟΥΣ") == ["ασ", "βουσ"]
    # dotted capital I: combining dot stripped, token joins back up
    assert tokenize_py("İx Xİ") == ["ix", "xi"]
    # ascii definition is untouched by the folds (rounds-1-5 identical:
    # no U+0307 strip, so İx lowers to i+◌̇+x and splits at the dot)
    assert tokenize_py("İx Grüße", ASCII_TOKEN_PATTERN) == ["i", "x", "gr", "e"]
    assert TOKEN_PATTERN == UNICODE_TOKEN_PATTERN


def test_multilingual_search_end_to_end(spark, tmp_path):
    """Non-Latin documents must be indexed and retrievable: build a
    small unicode-default index over docs in six scripts and check the
    exact top hit per query on BOTH query paths (kernel + join)."""
    from pylate_spark.plans.build import build_index
    from pylate_spark.plans.query import InvertedIndex

    texts = [
        "grüße aus münchen an alle",
        "η αθήνα είναι όμορφη πόλη",
        "москва большой город россия",
        "東京は大きい都市です",
        "مرحبا بالعالم من القاهرة",
        "नमस्ते दुनिया से दिल्ली",
        "plain english filler page",
        "plain english second page",
    ]
    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [f"https://x.test/{i:03d}" for i in range(len(texts))],
                "text": texts,
            }
        )
    )
    cfg = IndexConfig(shard_size=4, block_size=8, term_buckets=8, bm25=BM25Params())
    assert cfg.tokenizer == "unicode"
    d = str(tmp_path / "uidx")
    manifest = build_index(spark, pages, d, config=cfg, shards_per_batch=2)
    assert manifest["n_docs"] == len(texts)
    idx = InvertedIndex(spark, d)
    qs = [
        (0, "münchen"),
        (1, "αθήνα"),
        (2, "москва"),
        (3, "東京は大きい都市です"),
        (4, "القاهرة"),
        (5, "दिल्ली"),
    ]
    top = {
        r["query_id"]: r["docid"]
        for r in idx.search(qs, k=1).collect()
    }
    assert top == {qid: qid for qid, _ in qs}
    qdf = spark.createDataFrame(pd.DataFrame(qs, columns=["query_id", "text"]))
    top_j = {
        r["query_id"]: r["docid"]
        for r in idx.search_join(qdf, k=1).collect()
    }
    assert top_j == top


def test_ascii_manifest_backward_compat(spark, tmp_path):
    """An index built with tokenizer="ascii" must keep ascii semantics
    at query time (manifest roundtrip), and a manifest WITHOUT the key
    (rounds 1-5) must resolve to ascii."""
    from pylate_spark.plans.build import build_index
    from pylate_spark.plans.query import InvertedIndex

    pages = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://x.test/a", "https://x.test/b"],
                "text": ["gr e here", "grüße münchen"],
            }
        )
    )
    cfg = IndexConfig(
        shard_size=4, block_size=8, term_buckets=8, tokenizer="ascii"
    )
    d = str(tmp_path / "aidx")
    build_index(spark, pages, d, config=cfg, shards_per_batch=2)
    idx = InvertedIndex(spark, d)
    assert idx.config.tokenizer == "ascii"
    # under ascii, "grüße" tokenizes to [gr, e] — doc a (exact terms)
    # must outrank doc b for the query
    rows = idx.search([(0, "grüße")], k=2).collect()
    assert rows[0]["docid"] == 0
    # missing-key manifests resolve to ascii
    assert IndexConfig.from_dict(
        {"shard_size": 4, "block_size": 8, "term_buckets": 8}
    ).tokenizer == "ascii"
