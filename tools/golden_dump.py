"""Produce (or check) the committed golden dumps of the flagship
flow at sf0.001 — the evaluate_and_dump regression mechanism
(SURVEY §5 item 3).

Usage:
  python tools/golden_dump.py write    # refresh goldens/
  python tools/golden_dump.py check    # diff current output vs goldens/
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.chunking import fixed_chunks
from cocoindex_data_ingestion_spark.operators.text_analysis import text_profile
from cocoindex_data_ingestion_spark.plans.dumper import compare_golden, dump_golden
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")


def build_collectors(spark):
    docs = load_table(spark, "documents", SF_DIR).filter(F.col("doc_id") < 50)
    chunks = fixed_chunks(docs, 200, 50)
    profile = text_profile(docs)
    return {"chunks": chunks, "text_profile": profile}


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    spark = get_spark("golden_dump")
    collectors = build_collectors(spark)
    if mode == "write":
        counts = dump_golden(GOLDEN_DIR, collectors)
        print(f"wrote goldens: {counts}")
        return 0
    tmp = GOLDEN_DIR + ".candidate"
    dump_golden(tmp, collectors)
    diffs = compare_golden(tmp, GOLDEN_DIR)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    if diffs:
        print("GOLDEN MISMATCH:")
        for d in diffs:
            print(" ", d)
        return 1
    print("goldens match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
