"""Tokenization — the engine's analog of the reference's subword
tokenizer (``pylate/models/colbert.py:1086-1144``).

The reference's invariant is that encoding is a pure function of the
input text (same text → same token vectors). Ours is stronger and
simpler: ``tokens(text) = regexp_extract_all(lower(text), '[a-z0-9]+')``
— deterministic, ASCII-lowercased, identical in Python (`re`), Spark
(pandas UDF / `F.regexp_extract_all`), and DuckDB SQL, which is what
lets the DuckDB oracle reproduce the engine's results bit-for-bit.

The hot path is :func:`terms_long`: a single ``mapInPandas`` stage that
tokenizes, explodes, and computes per-(doc, term) tf and per-doc dl
entirely map-side with vectorized pandas — no per-row Python, no Spark
shuffle (the SPIMI "map" phase; the reference's analog is the chunked
encode pass, ``collection_indexer.py:408-449``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: single source of truth for the token definition
TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

TERMS_LONG_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("dl", T.IntegerType(), False),
    ]
)


def tokenize_py(text: str) -> list[str]:
    """Pure-python tokenizer (oracle side)."""
    return _TOKEN_RE.findall(text.lower())


def native_tokens_col(col) -> "F.Column":
    """Native (JVM, codegen) tokenizer column — must agree with
    :func:`tokenize_py`; group index 0 = whole match."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_PATTERN), F.lit(0))


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer: text → array<string> of tokens."""
    return texts.str.lower().str.findall(TOKEN_PATTERN)


def terms_long(docs: DataFrame, id_col: str = "docid", text_col: str = "text") -> DataFrame:
    """(docid, text) → long-format ``(docid, term, tf, dl)``.

    dl = total token count of the document (incl. duplicates); tf is
    per-(doc, term). One row per distinct (doc, term). All counting
    happens inside the Arrow batch (pandas groupby, C-level), so the
    downstream ``groupBy(term)`` shuffle moves pre-aggregated rows only.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            toks = pdf[text_col].str.lower().str.findall(TOKEN_PATTERN)
            lens = toks.str.len().to_numpy(dtype=np.int64)
            docids = np.repeat(pdf[id_col].to_numpy(dtype=np.int64), lens)
            if len(docids) == 0:
                continue
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            df = pd.DataFrame({"docid": docids, "term": flat})
            tf = df.groupby(["docid", "term"], sort=False).size().rename("tf").reset_index()
            dl_map = pd.Series(lens, index=pdf[id_col].to_numpy(dtype=np.int64))
            tf["dl"] = dl_map.reindex(tf["docid"]).to_numpy(dtype=np.int64)
            tf["tf"] = tf["tf"].astype(np.int32)
            tf["dl"] = tf["dl"].astype(np.int32)
            yield tf[["docid", "term", "tf", "dl"]]

    return docs.select(id_col, text_col).mapInPandas(gen, schema=TERMS_LONG_SCHEMA)
