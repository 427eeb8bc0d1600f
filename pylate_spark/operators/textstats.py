"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language id, document fingerprinting.

All of these are pure native column expressions (JVM, whole-stage
codegen — no Python in the hot path), each with an exact ANSI-SQL
twin used by the DuckDB oracle. The reference's analog surface is its
evaluation-time text munging (``concat(title, text)`` loaders,
``pylate/evaluation/beir.py:58-74``) and the skiplist/stopword
filtering discipline (``pylate/models/colbert.py:441-452``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pylate_spark.config import ENGLISH_STOPWORDS
from pylate_spark.functions.tokenize import native_tokens_col

PUNCT_CLASS = r"[^.!?,;:]"


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace vs regex token counts per document."""
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_ws_tokens"),
        F.size(native_tokens_col(text_col)).alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_features(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals + a simple
    composite quality score (rounded for cross-engine comparability)."""
    toks = native_tokens_col(text_col)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*ENGLISH_STOPWORDS)))
    n_punct = F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    punct_ratio = F.when(
        F.length(F.col(text_col)) > 0,
        n_punct.cast("double") / F.length(F.col(text_col)),
    ).otherwise(0.0)
    quality = (
        F.when(n_tokens >= 5, F.lit(1.0)).otherwise(0.0)
        * F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(100.0))
        * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
    )
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language id: English-stopword hit ratio (the n-gram
    heuristic degenerates to a seed-list ratio on this vocabulary)."""
    toks = native_tokens_col(text_col)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*ENGLISH_STOPWORDS)))
    ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    return df.select(
        F.col(id_col),
        F.round(ratio, 4).alias("en_ratio"),
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")).alias("lang_pred"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle: int = 5
) -> DataFrame:
    """Document fingerprints: md5 of the normalized token stream plus a
    min-shingle fingerprint (min md5 over word ``shingle``-grams — a
    1-hash winnowing sketch)."""
    toks = native_tokens_col(text_col)
    norm = F.array_join(toks, " ")
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (shingle - 1), F.lit(1))),
        lambda i: F.md5(F.array_join(F.slice(toks, i, shingle), " ")),
    )
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("text_hash"),
        F.when(n > 0, F.array_min(shingles)).alias("min_shingle_hash"),
    )
