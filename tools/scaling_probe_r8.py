"""Scaling probe for the round-8 operators: 1×/10×/50× parquet
scale-ups of sf0.1 inputs, warm repeat per factor (the r8 lesson from
rel_validate: discard the first-heavy-query session cost).

Operators probed:
- pca_power_fit/project — distributed exact-integer moment pass +
  dim-bounded driver iteration + per-row int64 projection
- det_hll_cells/estimate — one hash pass + (cells × buckets) MAX state
- bootstrap_mean_ci — post-repartition-fix evidence
- chunk_recursive_dp at the overlap parameterization (cs=400, ov=60)

Usage: python tools/scaling_probe_r8.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import (
    chunking,
    evaluation,
    sketches,
    vector_search,
)
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table
from tools.scaling_probe_r7c import SF_DIR, scaled, timed


def main() -> None:
    spark = get_spark("scaling_probe_r8")
    base = tempfile.mkdtemp(prefix="scaling_r8_")
    emb0 = load_table(spark, "embeddings", SF_DIR).filter(
        F.col("vec_id") != 0
    )
    li0 = load_table(spark, "lineitem", SF_DIR)
    docs0 = load_table(spark, "documents", SF_DIR)
    print("| factor | rows | pca_fit | pca_proj | hll | bootstrap | rec_ov |")
    print("|---|---|---|---|---|---|---|")
    try:
        for factor in (1, 10, 50):
            fdir = f"{base}/f{factor}"
            scaled(emb0, "vec_id", factor, 10_000_000).repartition(
                max(factor, 4)
            ).write.parquet(f"{fdir}/emb")
            scaled(li0, "l_orderkey", factor, 100_000_000).repartition(
                max(factor, 4)
            ).write.parquet(f"{fdir}/li")
            scaled(docs0, "doc_id", factor, 10_000_000).repartition(
                max(factor, 4)
            ).write.parquet(f"{fdir}/docs")
            emb = spark.read.parquet(f"{fdir}/emb")
            li = spark.read.parquet(f"{fdir}/li")
            docs = spark.read.parquet(f"{fdir}/docs")
            n = emb.count()

            state = {}

            def pca_fit():
                state["model"] = vector_search.pca_power_fit(emb, k=2)

            def pca_proj():
                nn, m, comps = state["model"]
                vector_search.pca_power_project(
                    emb, nn, m, comps
                ).count()

            def hll():
                cells = sketches.det_hll_cells(
                    li.select(F.col("l_returnflag").alias("g"), "l_partkey"),
                    ["g"], "l_partkey",
                )
                sketches.det_hll_estimate(cells, ["g"]).collect()

            def boot():
                evaluation.bootstrap_mean_ci(
                    li, "l_extendedprice", "l_orderkey", b=40
                ).collect()

            def rec_ov():
                chunking.chunk_recursive_dp(
                    docs, chunk_size=400, chunk_overlap=60
                ).count()

            timed(pca_fit)  # warmup discarded
            t_fit = timed(pca_fit)
            timed(pca_proj)  # warmup discarded
            t_proj = timed(pca_proj)
            timed(hll)
            t_hll = timed(hll)
            timed(boot)
            t_boot = timed(boot)
            timed(rec_ov)
            t_rec = timed(rec_ov)
            print(
                f"| {factor}× | emb {n} / li {li.count()} | {t_fit} | "
                f"{t_proj} | {t_hll} | {t_boot} | {t_rec} |"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
