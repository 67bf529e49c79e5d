"""Scaling probe for the round-7 second-wave operators: materialize
1×/10×/50× parquet scale-ups of sf0.1 docs/events and time each
operator (same method as tools/scaling_probe.py — flat parquet, not
union plans).

Usage: python tools/scaling_probe_r7b.py
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
    chunk_edit,
    chunking,
    docproc,
    entity_quality as eq,
    jobs,
    notion,
    taxonomy,
)
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
FACTORS = (1, 10, 50)


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
    spark = get_spark("scaling_probe_r7b")
    base = tempfile.mkdtemp(prefix="scaling_r7b_")
    docs0 = load_table(spark, "documents", SF_DIR)
    ev0 = load_table(spark, "events", SF_DIR)

    lines = [
        "",
        "## Round-7 second wave (1×/10×/50× sf0.1; seconds)",
        "",
        "All per-document/per-job local logic: one exchange at most",
        "(doc or job key), no cross-row state — the expectation is",
        "corpus-linear cost, with the small-factor rows dominated by",
        "fixed JVM/plan overhead.",
        "",
        "| factor | docs | taxonomy | sections | recursive_ref |"
        " chunk_split | chunk_merge | notion_fold | entity_quality |",
        "|---|---|---|---|---|---|---|---|",
    ]
    ev_lines = []
    for factor in FACTORS:
        fdir = f"{base}/f{factor}"
        scaled(docs0, "doc_id", factor, 1_000_000).write.parquet(
            f"{fdir}/docs"
        )
        scaled(ev0, "user_id", factor, 10_000_000).write.parquet(
            f"{fdir}/ev"
        )
        docs = spark.read.parquet(f"{fdir}/docs")
        ev = spark.read.parquet(f"{fdir}/ev")
        n_docs = docs.count()

        t_tax = timed(
            lambda: taxonomy.taxonomy_tags(docs).count()
        )
        md = docs.select(
            "doc_id",
            F.concat(
                F.lit("# T\n"), F.col("text"), F.lit("\n## S\n"),
                F.col("text"),
            ).alias("md"),
        )
        t_sec = timed(
            lambda: docproc.extract_sections(md, text_col="md").count()
        )
        t_rec = timed(
            lambda: docproc.recursive_chunks_ref(
                docs, chunk_size=120, chunk_overlap=30, min_chunk_size=20
            ).count()
        )
        chunks = chunking.fixed_chunks(docs, chunk_size=200, overlap=50).select(
            F.col("doc_id").alias("document_id"),
            F.md5(F.concat("doc_id", F.lit(":"), "chunk_index")).alias(
                "chunk_id"
            ),
            F.col("chunk_index").cast("long").alias("chunk_number"),
            "chunk_text",
            F.col("location_start").cast("long").alias("start_position"),
            F.col("location_end").cast("long").alias("end_position"),
        )
        splits = chunks.filter("chunk_number = 1").select(
            "chunk_id", F.lit(7).alias("split_position")
        )
        t_split = timed(
            lambda: chunk_edit.split_chunks(
                chunks, splits, doc_col="document_id"
            ).count()
        )
        groups = chunks.filter("chunk_number <= 1").select(
            "chunk_id",
            F.col("document_id").cast("string").alias("group_id"),
        )
        t_merge = timed(
            lambda: chunk_edit.merge_chunks(
                chunks, groups, doc_col="document_id"
            ).count()
        )
        blocks = docs.selectExpr(
            "doc_id AS page_id",
            "CAST(doc_id AS STRING) || '_h' AS block_id",
            "CAST(NULL AS STRING) AS parent_id",
            "0 AS pos",
            "'heading_1' AS block_type",
            "substr(text, 1, 40) AS text",
            "CAST(NULL AS BOOLEAN) AS checked",
            "CAST(NULL AS STRING) AS language",
            "CAST(NULL AS STRING) AS url",
            "CAST(NULL AS STRING) AS ref_id",
            "CAST(NULL AS STRING) AS title",
            "CAST(NULL AS STRING) AS caption",
            "CAST(NULL AS ARRAY<STRING>) AS cells",
            "true AS has_children",
        ).unionByName(
            docs.selectExpr(
                "doc_id AS page_id",
                "CAST(doc_id AS STRING) || '_p' AS block_id",
                "CAST(doc_id AS STRING) || '_h' AS parent_id",
                "1 AS pos",
                "'paragraph' AS block_type",
                "text AS text",
                "CAST(NULL AS BOOLEAN) AS checked",
                "CAST(NULL AS STRING) AS language",
                "CAST(NULL AS STRING) AS url",
                "CAST(NULL AS STRING) AS ref_id",
                "CAST(NULL AS STRING) AS title",
                "CAST(NULL AS STRING) AS caption",
                "CAST(NULL AS ARRAY<STRING>) AS cells",
                "false AS has_children",
            )
        )
        t_notion = timed(
            lambda: notion.pages_markdown(blocks, max_depth=2).count()
        )
        cand = docs.select(
            "doc_id",
            F.col("text").alias("name"),
            F.lit("component").alias("etype"),
            F.lit(0.5).alias("conf"),
            (F.col("doc_id") % 7).alias("rel"),
        )
        t_eq = timed(
            lambda: eq.annotate_should_keep(
                cand, F.col("name"), F.col("etype"), F.col("conf"),
                F.col("rel"),
            ).count()
        )
        lines.append(
            f"| {factor}× | {n_docs:,} | {t_tax} | {t_sec} | {t_rec} |"
            f" {t_split} | {t_merge} | {t_notion} | {t_eq} |"
        )

        updates = ev.select(
            F.col("user_id").alias("job_id"),
            F.col("event_id").alias("seq"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.when(F.col("event_type") == "purchase", "completed")
            .when(F.col("event_type") == "error", "failed")
            .when(
                (F.col("event_type") == "click") & (F.col("value") > 150),
                "cancelled",
            )
            .otherwise("running")
            .alias("status"),
            F.floor("value").cast("long").alias("progress"),
            F.lit(None).cast("string").alias("message"),
            F.lit(None).cast("string").alias("error"),
        )
        n_ev = ev.count()
        t_jobs = timed(lambda: jobs.job_ledger(updates, ts_col="us").count())
        ev_lines.append(f"| {factor}× | {n_ev:,} | {t_jobs} |")

        shutil.rmtree(fdir, ignore_errors=True)

    lines += [
        "",
        "Job-ledger fold over scaled events (windows partition by job",
        "id; state per group = one job's updates):",
        "",
        "| factor | events | job_ledger |",
        "|---|---|---|",
        *ev_lines,
    ]
    shutil.rmtree(base, ignore_errors=True)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "a"
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
