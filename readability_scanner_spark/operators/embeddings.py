"""V1 embedding generation: the pluggable model seam.

The reference's vector service loads a sentence-transformers model once
per process and encodes batches (ml-service/services/vector_service.py:
24-103). The Spark-native seam for exactly that shape is
``pyspark.ml.functions.predict_batch_udf``: the model factory runs ONCE
per python worker (model load amortized), batches arrive as numpy
arrays, Arrow moves the vectors. A user plugs a real encoder by passing
their own ``make_predict_fn``; the default is a clearly-marked
deterministic stub (no model libraries ship in this container) so the
distributed plumbing stays testable end to end.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Optional

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


def embed_text_prep(title: Column, content: Column, max_content_chars: int = 2000) -> Column:
    """E7 embedding text prep (vector_service.py:49-76):
    title + ' ' + content[:max]."""
    return F.concat_ws(" ", title, F.substring(content, 1, max_content_chars))


def stub_predict_fn(dim: int = 64) -> Callable[[np.ndarray], np.ndarray]:
    """DETERMINISTIC STUB encoder — not a model. Each text hashes to a
    seeded unit vector; values carry no semantics. Replace via the
    make_predict_fn parameter of make_embed_udf with e.g. a
    sentence-transformers encode closure."""

    def predict(texts: np.ndarray) -> np.ndarray:
        out = np.empty((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(
                hashlib.md5(str(t).encode("utf-8", "ignore")).digest()[:4], "little"
            )
            rng = np.random.RandomState(seed)
            v = rng.standard_normal(dim)
            out[i] = (v / (np.linalg.norm(v) or 1.0)).astype(np.float32)
        return out

    return predict


def make_embed_udf(
    make_predict_fn: Optional[Callable[[], Callable[[np.ndarray], np.ndarray]]] = None,
    dim: int = 64,
    batch_size: int = 64,
):
    """predict_batch_udf seam: ``make_predict_fn()`` is invoked once per
    python worker and must return ``fn(texts: np.ndarray) -> np.ndarray``
    of shape (n, dim) — the exact contract a GPU-backed
    sentence-transformers closure satisfies. Default: the deterministic
    stub above."""
    from pyspark.ml.functions import predict_batch_udf

    factory = make_predict_fn if make_predict_fn is not None else (lambda: stub_predict_fn(dim))
    return predict_batch_udf(
        factory, return_type=ArrayType(FloatType()), batch_size=batch_size
    )


def embed_documents(
    df: DataFrame,
    id_col: str,
    title_col: str,
    content_col: str,
    make_predict_fn=None,
    dim: int = 64,
    batch_size: int = 64,
) -> DataFrame:
    """Full V1 flow: prep text → batched encode → (id, embedding)."""
    udf = make_embed_udf(make_predict_fn, dim, batch_size)
    prep = embed_text_prep(F.col(title_col), F.col(content_col))
    return df.select(F.col(id_col), udf(prep).alias("embedding"))
