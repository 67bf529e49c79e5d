"""Scaling probe for the round-7 third-wave operators: materialize
1×/10×/50× parquet scale-ups of sf0.1 docs/events and time each
operator (same method as tools/scaling_probe.py — flat parquet, not
union plans).

Usage: python tools/scaling_probe_r7c.py
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
    chunking,
    entities as ent,
    relationship_model as rm,
    state_machine as sm,
)
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
FACTORS = (1, 10, 50)

GAZETTEER = {
    "spark": "TECHNOLOGY", "hash": "CONCEPT", "join": "OPERATION",
    "window": "OPERATION", "stream": "CONCEPT",
}


def scaled(df, id_col: str, factor: int, shift: int):
    if factor == 1:
        return df
    parts = [df]
    for i in range(1, factor):
        parts.append(df.withColumn(id_col, F.col(id_col) + i * shift))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("scaling_probe_r7c")
    base = tempfile.mkdtemp(prefix="scaling_r7c_")
    docs0 = load_table(spark, "documents", SF_DIR)

    lines = [
        "",
        "## Round-7 third wave (1×/10×/50× sf0.1; seconds)",
        "",
        "`rel_validate` types every co-occurring entity pair with the",
        "app-model keyword heuristic and joins the BROADCAST 14-row",
        "matrix — the pair self-join dominates and is bounded by the",
        "per-chunk entity count, not the corpus; `state_fold` and",
        "`state_metrics` are one grouped pass + one global agg over the",
        "posexploded transition ledger (map-side combinable);",
        "`chunks_ctx` is the fixed chunker plus pure substring",
        "expressions (no join — parent text stays in-row). All are",
        "expected corpus-linear; small factors sit on the JVM floor.",
        "",
        "| factor | docs | rel_validate | state_fold | state_metrics"
        " | chunks_ctx |",
        "|---|---|---|---|---|",
    ]
    for factor in FACTORS:
        fdir = f"{base}/f{factor}"
        scaled(docs0, "doc_id", factor, 1_000_000).write.parquet(
            f"{fdir}/docs"
        )
        docs = spark.read.parquet(f"{fdir}/docs")
        n_docs = docs.count()

        mention_src = docs.select(
            F.col("doc_id").cast("string").alias("chunk_id"),
            F.col("doc_id").cast("string").alias("document_id"),
            F.col("text").alias("chunk_text"),
        )
        mentions = ent.quality_filter(
            ent.extract_mentions_gazetteer(mention_src, GAZETTEER)
        )
        pairs = ent.cooccurrence_relationships(mentions)

        def rel_validate():
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

        t_rel = timed(rel_validate)

        ledger = sm.simulate_transition_ledger(docs.select("doc_id"))
        t_fold = timed(
            lambda: sm.fold_document_states(ledger).count()
        )
        t_metrics = timed(
            lambda: sm.processing_metrics(
                sm.fold_document_states(ledger)
            ).collect()
        )

        def chunks_ctx():
            chunks = chunking.fixed_chunks(
                docs, chunk_size=200, overlap=50, keep_text=True
            )
            start, end = F.col("location_start"), F.col("location_end")
            bs = F.greatest(start - 200, F.lit(0))
            ae = F.least(F.length("text"), end + 200)
            return chunks.select(
                "doc_id",
                F.substring(
                    F.col("text"), (bs + 1).cast("int"),
                    (start - bs).cast("int"),
                ).alias("before"),
                F.substring(
                    F.col("text"), (end + 1).cast("int"),
                    (ae - end).cast("int"),
                ).alias("after"),
            ).count()

        t_ctx = timed(chunks_ctx)

        lines.append(
            f"| {factor}× | {n_docs:,} | {t_rel} | {t_fold} |"
            f" {t_metrics} | {t_ctx} |"
        )
        print(lines[-1], flush=True)
        shutil.rmtree(fdir, ignore_errors=True)

    shutil.rmtree(base, ignore_errors=True)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
