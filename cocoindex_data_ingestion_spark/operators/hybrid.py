"""Hybrid search: vector + BM25 (+ graph) fused with RRF.

Reference behavior: ``SearchService.hybrid_search``
(app/services/search_service.py:181-279): embed query once, fan out
to vector search + BM25 (+ graph seed), RRF-fuse (k=60), optional
rerank, top-k.

Spark-first: each leg is an independent small top-k DataFrame; the
fan-out is just two lazy plans unioned by name — Catalyst evaluates
them in one job, and the fusion groupBy runs over ≤ (legs × k)
rows. Nothing here shuffles the corpus: the vector leg is a
TakeOrderedAndProject scan, the BM25 leg touches only the query
terms' postings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.bm25 import bm25_search
from cocoindex_data_ingestion_spark.operators.fusion import rrf_fuse
from cocoindex_data_ingestion_spark.operators.vector_search import knn


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_vec: Column,
    query_terms: list[str],
    k: int = 10,
    leg_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vector leg + BM25 leg → RRF. Returns (id, rrf_score, n_sources)."""
    vec_leg = knn(
        embeddings, query_vec, k=leg_k, vec_col=vec_col, id_col=vec_id_col
    ).select(
        F.lit("vector").alias("source"),
        F.col(vec_id_col).alias("id"),
        F.col("score"),
    )
    bm25_leg = bm25_search(
        docs, query_terms, k=leg_k, id_col=id_col, text_col=text_col
    ).select(
        F.lit("bm25").alias("source"), F.col(id_col).alias("id"), F.col("score")
    )
    return rrf_fuse(vec_leg.unionByName(bm25_leg), limit=k)
