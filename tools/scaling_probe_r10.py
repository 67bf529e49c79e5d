"""100× scaling probe for `dedup_components_star` (r9 verdict
directive #5): the heaviest standing iterative whose hot-bucket caps
and star-round count ARE the 100 TB safety argument had only been
probed to 50× indirectly (via other dedup rows) — this extends the
r9 probe methodology (flat materialized parquet per factor, warm
repeat with the first timing per factor discarded, text-SALTED
copies so the per-bucket duplicate profile of the real fixture is
preserved — unsalted copies would put every doc in a factor-sized
exact-duplicate bucket and probe a degenerate profile) to factors
1×/10×/50×/100× of the sf0.1 documents table (5k → 500k docs).

The probed plan is the registry-shaped one: bm25-token filter →
minhash_lsh_edges (16 hashes / 4 bands, star edges per bucket with
hot-bucket caps) → connected_components_star (alternating
large-star/small-star rounds over checkpointed lineage).

Usage: python tools/scaling_probe_r10.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.functions.text import bm25_tokens
from cocoindex_data_ingestion_spark.operators import dedup
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table
from tools.scaling_probe_r7c import SF_DIR, timed
from tools.scaling_probe_r9 import scaled_docs

FACTORS = (1, 10, 50, 100)


def main() -> None:
    spark = get_spark("scaling_probe_r10")
    base = tempfile.mkdtemp(prefix="scaling_r10_")
    docs0 = load_table(spark, "documents", SF_DIR)
    print("| factor | docs | edges | components_star |")
    print("|---|---|---|---|")
    try:
        for factor in FACTORS:
            fdir = f"{base}/f{factor}"
            scaled_docs(docs0, factor).repartition(
                max(factor, 4)
            ).write.parquet(fdir)
            docs = spark.read.parquet(fdir)
            n = docs.count()

            nonempty = docs.filter(F.size(bm25_tokens("text")) > 0)
            n_edges = [0]

            def run():
                edges = dedup.minhash_lsh_edges(
                    nonempty,
                    num_hashes=entrymod._MINHASH_HASHES,
                    bands=entrymod._MINHASH_BANDS,
                )
                n_edges[0] = edges.count()
                dedup.connected_components_star(edges).count()

            timed(run)  # warm repeat: discard first timing per factor
            t = timed(run)
            print(f"| {factor} | {n} | {n_edges[0]} | {t} |", flush=True)
            shutil.rmtree(fdir, ignore_errors=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
