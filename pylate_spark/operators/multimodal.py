"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery here is real and tested — schemas, Arrow
batch shapes, partitioning-friendly metadata extraction — while the
actual media decode is STUBBED (this container ships no image/audio
libraries): :func:`image_features` tries Pillow and otherwise emits a
clearly-marked deterministic fake feature vector so downstream
plumbing (e.g. :func:`pylate_spark.operators.similarity.cosine_topk`
over the features) can be exercised end-to-end.

Reference analog: the encoder boundary — opaque payload in, fixed-dim
vectors out (``pylate/models/colbert.py:494-803``) — which is exactly
the contract a media featurizer has.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: magic-byte prefixes → media type (hex, uppercase as F.hex emits)
MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "riff",  # wav/avi/webp container
    "1A45DFA3": "video/webm",
    "3C68746D": "text/html",
    "3C21444F": "text/html",
}

FEATURE_DIM = 16

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("decoder", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def binary_meta(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """Typed metadata for an opaque binary column — native exprs only:
    size, magic-sniffed media type, md5 (dedup key for byte-identical
    assets)."""
    prefix = F.hex(F.substring(F.col(bin_col), 1, 4))
    media = F.lit("unknown")
    for magic, typ in MAGIC.items():
        media = F.when(prefix.startswith(magic), F.lit(typ)).otherwise(media)
    return df.select(
        F.col(id_col),
        F.length(F.col(bin_col)).alias("n_bytes"),
        media.alias("media_type"),
        F.md5(F.col(bin_col)).alias("content_hash"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a tiny byte-histogram
    sketch. STUB — replace with a real decode when media libs exist."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    return hist / hist.sum()


def image_features(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload", require_real_decode: bool = False
) -> DataFrame:
    """Decode → fixed-dim feature vector, as an Arrow-batched
    ``mapInPandas`` stage (the real plumbing: schema, batch shape,
    partition-parallel).

    ``require_real_decode=True`` raises ``NotImplementedError`` when no
    image library is available instead of falling back to the stub.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image
        except ImportError:
            Image = None
            if require_real_decode:
                raise NotImplementedError(
                    "real image decode requires Pillow; not available in this environment"
                )

        def featurize(payload: bytes) -> tuple[str, list[float]]:
            """The ``decoder`` label reports what actually produced the
            features: 'pillow' ONLY for a successful real decode,
            'stub-histogram' for the deterministic fallback."""
            if Image is not None:
                try:
                    import io

                    img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
                    px = np.asarray(img, dtype=np.float32).ravel()
                    total = float(px.sum())
                    return "pillow", (px / total if total else px).tolist()
                except Exception:
                    if require_real_decode:
                        raise
            return "stub-histogram", _fake_features(payload).tolist()

        for pdf in batches:
            if not len(pdf):
                continue
            out = [featurize(p) for p in pdf[bin_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[bin_col].str.len().astype("int64"),
                    "decoder": [d for d, _ in out],
                    "features": [f for _, f in out],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n_bytes: int = 4096, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """Video frame-sampling *plan* plumbing: emits (doc_id, frame_idx,
    offset) rows — the partition/explode shape of a real frame sampler,
    with byte offsets standing in for timestamps (decode STUBBED)."""
    n_frames = F.greatest((F.length(F.col(bin_col)) / F.lit(every_n_bytes)).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "offset_mult"),
    ).select(
        id_col,
        "frame_idx",
        (F.col("offset_mult") * every_n_bytes).cast("long").alias("byte_offset"),
    )
