"""Phase-level profile of build_search_index (r11, guide §1).

Usage: python tools/r11_index_profile.py <sf_dir>

Re-runs the exact _ensure_index build (same options) into a throwaway
dir, timing each layout write separately with job descriptions, so
the 15-21 s leg_builds.search_index number decomposes into phases.
One rep — profiler, not timer.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_spark("r11_index_profile")
    docs = entrymod._t(spark, sf_dir, "documents")
    embeddings = entrymod._t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") != 0
    )
    idx = tempfile.mkdtemp(prefix="r11_idxprof_")

    from cocoindex_data_ingestion_spark.functions.text import (
        is_content_token, tokenize,
    )
    from cocoindex_data_ingestion_spark.functions.similarity import l2_norm
    from cocoindex_data_ingestion_spark.operators import indexing as ix
    from cocoindex_data_ingestion_spark.operators.vector_search import (
        lsh_signature,
    )

    t_all = time.time()
    marks: list[tuple[str, float]] = []

    def mark(name: str, t0: float) -> None:
        marks.append((name, round(time.time() - t0, 3)))
        print(f"{name:28s} {marks[-1][1]:7.3f}", flush=True)

    sc = spark.sparkContext

    toks = docs.select(
        F.col("doc_id"), F.explode(tokenize("text")).alias("token")
    ).filter(is_content_token("token"))
    postings = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dls = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))

    sc.setJobDescription("idx: doclens write")
    t0 = time.time()
    dls.write.mode("overwrite").parquet(f"{idx}/doclens")
    mark("doclens", t0)

    dfs = postings.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    denorm = (
        postings.join(dls, "doc_id")
        .join(dfs, "token")
        .withColumn("tbucket", ix._token_bucket(F.col("token")))
    )
    sc.setJobDescription("idx: postings write")
    t0 = time.time()
    (
        denorm.repartition("tbucket")
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite").partitionBy("tbucket")
        .parquet(f"{idx}/postings")
    )
    mark("postings", t0)

    sc.setJobDescription("idx: stats")
    t0 = time.time()
    n_docs = docs.count()
    from cocoindex_data_ingestion_spark.functions.localrel import local_df
    stats = local_df(spark, [(n_docs,)], "n_docs long").crossJoin(
        dls.agg(F.avg("dl").alias("avgdl"))
    )
    stats.write.mode("overwrite").parquet(f"{idx}/stats")
    mark("stats", t0)

    vectors = embeddings.select(
        F.col("vec_id"), F.col("embedding"),
        l2_norm("embedding").alias("norm"),
        lsh_signature("embedding", entrymod._LSH_BITS).alias("sig"),
    )
    sc.setJobDescription("idx: vectors flat")
    t0 = time.time()
    vectors.write.mode("overwrite").parquet(f"{idx}/vectors")
    mark("vectors_flat", t0)

    sc.setJobDescription("idx: vectors_lsh")
    t0 = time.time()
    vectors.write.mode("overwrite").partitionBy("sig").parquet(
        f"{idx}/vectors_lsh"
    )
    mark("vectors_lsh", t0)

    sc.setJobDescription("idx: ivf")
    t0 = time.time()
    ix.build_ivf_layout(embeddings, idx, stride=entrymod._IVF_STRIDE)
    mark("ivf_layout", t0)

    sc.setJobDescription("idx: pq")
    t0 = time.time()
    ix.build_pq_layout(
        embeddings, idx, m=entrymod._PQ_M, cb_k=entrymod._PQ_K,
        sub_d=entrymod._PQ_SUBD,
    )
    mark("pq_layout", t0)

    sc.setJobDescription("idx: positions")
    t0 = time.time()
    ix.build_positions_layout(docs, idx)
    mark("positions", t0)

    sc.setJobDescription(None)
    print(f"{'TOTAL':28s} {time.time() - t_all:7.3f}")
    import shutil
    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
