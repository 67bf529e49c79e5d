"""Scaling probe for the round-9 operator: 1×/10×/50× scale-ups of
the sf0.1 documents table for `curation.boilerplate_strip`, with the
warm-repeat-per-factor methodology (first timing per factor
discarded — the r7/r8 lesson).

The copies are text-SALTED (a per-copy token appended to the last
paragraph) so the paragraph-uniqueness profile of the real fixture is
preserved — an unsalted union would make EVERY paragraph appear in
`factor` docs and flip the whole corpus to boilerplate, probing a
different (degenerate) work profile. The probed query is the
registry-shaped one: per-source synthetic header/footer boilerplate
added, stripped, docs reassembled, md5 witness.

Usage: python tools/scaling_probe_r9.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import curation
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table
from tools.scaling_probe_r7c import SF_DIR, timed


def scaled_docs(docs, factor: int, shift: int = 10_000_000):
    if factor == 1:
        return docs
    parts = [docs]
    for i in range(1, factor):
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + i * shift)
            .withColumn("text", F.concat("text", F.lit(f" copysalt{i}")))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _augmented(docs):
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("Header: site "), F.col("source"), F.lit(" navigation\n\n"),
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("\n\nFooter: mirrored from "), F.col("source")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("scaling_probe_r9")
    base = tempfile.mkdtemp(prefix="scaling_r9_")
    docs0 = load_table(spark, "documents", SF_DIR)
    print("| factor | docs | boilerplate_strip |")
    print("|---|---|---|")
    try:
        for factor in (1, 10, 50):
            fdir = f"{base}/f{factor}"
            scaled_docs(docs0, factor).repartition(
                max(factor, 4)
            ).write.parquet(fdir)
            docs = spark.read.parquet(fdir)
            n = docs.count()

            def run():
                curation.boilerplate_strip(_augmented(docs)).select(
                    F.md5("clean_text")
                ).count()

            timed(run)  # warm repeat: discard first timing per factor
            print(f"| {factor} | {n} | {timed(run)} |")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
