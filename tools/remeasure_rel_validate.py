"""Re-measure the rel_validate SCALING row (r7 verdict watch item #2).

The r7 third-wave probe timed rel_validate ONCE per factor, first
factor first — so the 1× row carried (a) all JVM/codegen/Python-worker
warmup and (b) a single-partition parquet scan (factor 1 writes the
1-split sf0.1 docs verbatim, so the gazetteer mapInPandas ran on ONE
thread, while 10×/50× unions wrote 10/50 splits and parallelized).
This probe separates the two effects: per factor it reports the scan
partition count and times the identical pipeline twice, discarding
the first (warm column is the honest row), plus a 1×-repartitioned
variant that restores the parallelism a many-file production scan
would have.

Usage: python tools/remeasure_rel_validate.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import (
    entities as ent,
    relationship_model as rm,
)
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table
from tools.scaling_probe_r7c import GAZETTEER, SF_DIR, scaled, timed


def rel_validate(spark, docs):
    mention_src = docs.select(
        F.col("doc_id").cast("string").alias("chunk_id"),
        F.col("doc_id").cast("string").alias("document_id"),
        F.col("text").alias("chunk_text"),
    )
    mentions = ent.quality_filter(
        ent.extract_mentions_gazetteer(mention_src, GAZETTEER)
    )
    pairs = ent.cooccurrence_relationships(mentions)
    typed = pairs.select(
        rm.entity_type_col("source_name").alias("s"),
        rm.entity_type_col("target_name").alias("t"),
        "n_cooccurrences",
    )
    joined = typed.crossJoin(F.broadcast(rm.rel_types_df(spark)))
    return (
        joined.filter(rm.validate_entities_col("s", "t"))
        .groupBy("label")
        .agg(F.count("*").alias("n_pairs"))
        .count()
    )


def main() -> None:
    spark = get_spark("remeasure_rel_validate")
    docs0 = load_table(spark, "documents", SF_DIR)
    base = tempfile.mkdtemp(prefix="rel_validate_r8_")
    print("| factor | docs | scan parts | cold | warm |")
    print("|---|---|---|---|---|")
    try:
        for factor, label in ((1, "1x"), (1, "1x-repart"), (10, "10x"), (50, "50x")):
            fdir = f"{base}/{label}"
            src = scaled(docs0, "doc_id", factor, 1_000_000)
            if label == "1x-repart":
                src = src.repartition(32)
            src.write.parquet(f"{fdir}/docs")
            docs = spark.read.parquet(f"{fdir}/docs")
            n_docs = docs.count()
            parts = docs.rdd.getNumPartitions()
            cold = timed(lambda: rel_validate(spark, docs))
            warm = timed(lambda: rel_validate(spark, docs))
            print(f"| {label} | {n_docs} | {parts} | {cold} | {warm} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
