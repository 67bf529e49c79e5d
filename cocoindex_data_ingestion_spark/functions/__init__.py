"""Pure expression helpers shared by operators and oracle-SQL builders."""

from cocoindex_data_ingestion_spark.functions.similarity import (
    cosine_sim,
    cosine_sim_sql,
    dot,
    l2_norm,
)
from cocoindex_data_ingestion_spark.functions.text import (
    STOPWORDS,
    bm25_tokens,
    bm25_tokens_sql,
    tokenize,
    tokenize_sql,
)

__all__ = [
    "cosine_sim",
    "cosine_sim_sql",
    "dot",
    "l2_norm",
    "STOPWORDS",
    "bm25_tokens",
    "bm25_tokens_sql",
    "tokenize",
    "tokenize_sql",
]
