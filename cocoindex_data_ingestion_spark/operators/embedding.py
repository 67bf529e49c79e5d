"""Embedding operators: pluggable embedder interface + deterministic
test double.

Reference behavior: ``EmbedText`` (remote APIs, cached,
src/ops/functions/embed_text.rs:8-52), ``SentenceTransformerEmbed``
(local model, python/cocoindex/functions.py:62-112), and ColPali
multi-vector embedding (functions.py:168-299). All are (text →
Vector[Float32, dim]) scalar functions executed in batches.

Spark-first: every embedder is a pandas UDF (Arrow batches, one
model per executor via lazy init). The remote-API shape (batching,
caching, backpressure) is preserved:

- batching = Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch)
- caching  = plans.incremental.MemoCache wrapped around the UDF stage
- rate limits = maxRecordsPerBatch + per-executor semaphore inside
  the UDF (the reference's max_inflight control, spec.rs:247-262)

The default implementation is the *deterministic hash embedder* used
for tests (SURVEY §7 'non-deterministic operators' isolation): token
→ md5 → pseudo-random unit contribution, summed and L2-normalized.
Deterministic, vocabulary-free, reproducible anywhere.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


def _hash_token_vec(token: str, dim: int) -> np.ndarray:
    """Deterministic pseudo-random vector for a token: md5-seeded
    uniform values in [-0.5, 0.5)."""
    out = np.empty(dim, dtype=np.float64)
    for i in range(0, dim, 4):
        h = hashlib.md5(f"{token}:{i // 4}".encode()).digest()
        for j in range(min(4, dim - i)):
            val = int.from_bytes(h[j * 4 : j * 4 + 4], "big")
            out[i + j] = val / 2**32 - 0.5
    return out


def hash_embed_series(texts: pd.Series, dim: int = DEFAULT_DIM) -> pd.Series:
    def embed(text: str | None) -> list[float]:
        toks = [t for t in (text or "").lower().split() if t]
        if not toks:
            return [0.0] * dim
        acc = np.zeros(dim, dtype=np.float64)
        for t in toks:
            acc += _hash_token_vec(t, dim)
        norm = math.sqrt(float((acc * acc).sum()))
        if norm > 0:
            acc /= norm
        return [float(x) for x in acc]

    return texts.map(embed)


def hash_embedder(dim: int = DEFAULT_DIM) -> Callable[..., Column]:
    """pandas UDF: text → array<float> (deterministic test double)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return hash_embed_series(texts, dim)

    return embed_udf


def multi_vector_hash_embedder(
    dim: int = DEFAULT_DIM, max_vectors: int = 8
) -> Callable[..., Column]:
    """ColPali-style multi-vector test double: one vector per
    whitespace 'segment' of up to max_vectors (shape
    [segments][dim], reference functions.py:168-233)."""

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.FloatType())))
    def embed_udf(texts: pd.Series) -> pd.Series:
        def embed(text: str | None) -> list[list[float]]:
            toks = [t for t in (text or "").lower().split() if t][:max_vectors]
            if not toks:
                return [[0.0] * dim]
            return [
                [float(x) for x in _hash_token_vec(t, dim)] for t in toks
            ]

        return texts.map(embed)

    return embed_udf


def embed_documents(
    docs: DataFrame,
    embedder: Callable[..., Column] | None = None,
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Attach an embedding column. With a real model embedder this is
    the expensive stage — wrap it in MemoCache.through() so re-runs
    only embed changed rows (the reference's cached EmbedText)."""
    udf = embedder or hash_embedder()
    return docs.withColumn(out_col, udf(F.col(text_col)))


def batched_api_embedder(
    call_api: Callable[[list[str]], list[list[float]]],
    batch_size: int = 128,
    max_concurrent: int = 4,
    max_retries: int = 3,
) -> Callable[..., Column]:
    """Adapter for remote embedding APIs (EmbedText shape): the
    iterator form processes Arrow batches; ``call_api`` receives
    bounded chunks under a per-executor concurrency cap with
    exponential-backoff retry (the reference's retryable + inflight
    controls). Inject the real client at deploy time; tests inject a
    fake."""
    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # imported + constructed in the executor worker (semaphores
        # don't pickle into closures)
        from cocoindex_data_ingestion_spark.functions.retry import (
            executor_rate_limiter, with_retry,
        )

        limiter = executor_rate_limiter(max_concurrent)
        for texts in it:
            out: list[list[float]] = []
            vals = texts.fillna("").tolist()
            for i in range(0, len(vals), batch_size):
                chunk = vals[i : i + batch_size]
                with limiter:
                    out.extend(
                        with_retry(
                            lambda c=chunk: call_api(c),
                            max_retries=max_retries,
                            base_delay_s=0.05,
                            max_delay_s=2.0,
                        )
                    )
            yield pd.Series(out)

    return embed_udf


# Supported embedding models with dimensions and pricing
# (EmbeddingService.MODELS, app/services/embedding_service.py:29-43).
# Cost accounting (:101-103): token_count = len(text.split()) * 1.3,
# cost = token_count / 1000 * price_per_1k_tokens.
EMBEDDING_MODELS = {
    "text-embedding-3-small": {"dimensions": 1536, "price_per_1k_tokens": 0.00002},
    "text-embedding-3-large": {"dimensions": 3072, "price_per_1k_tokens": 0.00013},
    "text-embedding-ada-002": {"dimensions": 1536, "price_per_1k_tokens": 0.00010},
}
TOKENS_PER_WORD_EST = 1.3  # embedding_service.py:102
