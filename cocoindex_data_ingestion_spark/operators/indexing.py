"""Prebuilt search indexes: the production path for the query surface.

The ad-hoc operators (bm25_search, knn) recompute postings/norms from
the raw corpus inside every query — correct, but at 100 TB the index
must be *built once and pruned at query time*, exactly like the
reference's externalized indexes (Qdrant collections, Postgres GIN):

- ``build_search_index`` writes:
  - ``postings/``  parquet partitioned by token → a term lookup is
    partition pruning (reads only the query terms' files);
  - ``doclens/``   per-doc token counts;
  - ``stats/``     (n_docs, avgdl) one row;
  - ``vectors/``   embeddings + precomputed L2 norm, parquet
    partitioned by sign-LSH signature → ANN probes read only the
    query's bucket partition.
- ``indexed_bm25`` / ``indexed_knn`` / ``indexed_knn_exact`` answer
  queries from those layouts. Results are IDENTICAL to the ad-hoc
  operators (same math, same rounding) — the DuckDB oracles are
  shared.

At cluster scale the same layout is a Delta/Iceberg table with
bucketing on token / z-order on signature; partition pruning is what
turns O(corpus) per query into O(result).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.compare import (
    stable_round,
    stable_sum,
)
from cocoindex_data_ingestion_spark.functions.similarity import dot
from cocoindex_data_ingestion_spark.functions.text import bm25_tokens
from cocoindex_data_ingestion_spark.operators.bm25 import B, K1
from cocoindex_data_ingestion_spark.operators.vector_search import lsh_signature


def build_search_index(
    docs: DataFrame,
    embeddings: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    lsh_bits: int = 8,
) -> None:
    """One pass over the corpus → queryable index layout on disk."""
    from cocoindex_data_ingestion_spark.functions.text import (
        is_content_token, tokenize,
    )

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    ).filter(is_content_token("token"))
    postings = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    postings.write.mode("overwrite").partitionBy("token").parquet(
        f"{index_dir}/postings"
    )

    dls = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dls.write.mode("overwrite").parquet(f"{index_dir}/doclens")

    n_docs = docs.count()
    spark = docs.sparkSession
    stats = spark.createDataFrame(
        [(n_docs,)], "n_docs long"
    ).crossJoin(dls.agg(F.avg("dl").alias("avgdl")))
    stats.write.mode("overwrite").parquet(f"{index_dir}/stats")

    from cocoindex_data_ingestion_spark.functions.similarity import l2_norm

    vectors = embeddings.select(
        F.col(vec_id_col),
        F.col(vec_col),
        l2_norm(vec_col).alias("norm"),
        lsh_signature(vec_col, lsh_bits).alias("sig"),
    )
    # flat layout for exact scans (no small-files overhead) +
    # sig-partitioned layout for ANN partition pruning
    vectors.write.mode("overwrite").parquet(f"{index_dir}/vectors")
    vectors.write.mode("overwrite").partitionBy("sig").parquet(
        f"{index_dir}/vectors_lsh"
    )


def indexed_bm25(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    round_to: int = 4,
) -> DataFrame:
    """BM25 from the prebuilt index: token-partition-pruned postings
    read + two broadcast scalars. No corpus scan, no tokenization."""
    qterms = list(dict.fromkeys(t.lower() for t in query_terms))
    postings = spark.read.parquet(f"{index_dir}/postings").filter(
        F.col("token").isin(qterms)  # → partition pruning
    )
    dls = spark.read.parquet(f"{index_dir}/doclens")
    stats = spark.read.parquet(f"{index_dir}/stats")

    df_per_token = postings.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    scored = (
        postings.join(F.broadcast(df_per_token), "token")
        .join(dls, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(id_col)
        # same order-independent fixed-point sum as bm25.bm25_search —
        # keeps the shared DuckDB oracle bit-identical
        .agg(stable_round(stable_sum(F.col("term_score"), 6), round_to).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score")
    )


def _scored_vectors(
    vectors: DataFrame, query_vec: Column, id_col: str, round_to: int
) -> DataFrame:
    cos = F.when(
        (F.col("norm") > 0),
        dot(F.col("embedding"), query_vec)
        / (F.col("norm") * F.sqrt(dot(query_vec, query_vec))),
    ).otherwise(F.lit(0.0))
    return vectors.withColumn("score", stable_round(cos, round_to))


def indexed_knn(
    spark: SparkSession,
    index_dir: str,
    query_vec_df: DataFrame,
    k: int = 10,
    lsh_bits: int = 8,
    id_col: str = "vec_id",
    exact: bool = False,
    round_to: int = 4,
) -> DataFrame:
    """Top-k from the vector index. ``exact=False`` probes ONLY the
    query's LSH-signature partition; ``exact`` scans the flat layout
    (norms still precomputed).

    ``query_vec_df``: one row with column ``qvec``. The query vector
    is resolved driver-side (a search request is a literal) so the
    signature is a compile-time constant — that is what makes the
    partition filter STATIC pruning (``PartitionFilters: [sig =
    '...']``) instead of a per-row post-scan filter."""
    qrow = query_vec_df.select("qvec").collect()[0]
    qvec_vals = list(qrow["qvec"])
    qvec = F.array(*[F.lit(float(x)) for x in qvec_vals])
    qsig = "".join("1" if x > 0 else "0" for x in qvec_vals[:lsh_bits])

    if exact:
        vectors = spark.read.parquet(f"{index_dir}/vectors")
    else:
        vectors = spark.read.parquet(f"{index_dir}/vectors_lsh").filter(
            F.col("sig") == qsig
        )
    scored = _scored_vectors(vectors, qvec, id_col, round_to)
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score")
    )
