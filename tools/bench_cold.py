"""Cold-session latency for ONE query (bench.py cold rows, VERDICT r6
directive #7): fresh JVM + SparkSession, empty reader/plan/scalar
caches, index layouts prebuilt on disk (passed via the
SPARK_GRAFT_INDEX_DIR / SPARK_GRAFT_EDGES_DIR hooks) — so the number
prices exactly what the r6 warm-latency engineering hides (listing,
schema, analysis, codegen, AQE waves), never a redundant build and
never the data path twice.

Usage: python tools/bench_cold.py <query_name> <sf_dir>
Prints one JSON line {"query": name, "cold_sec": t}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.session import get_spark


def main() -> None:
    name, sf_dir = sys.argv[1], sys.argv[2]
    spark = get_spark("bench_cold")  # session build is NOT timed
    fn = entrymod.queries()[name]
    t0 = time.time()
    fn(spark, sf_dir).collect()
    print(json.dumps({"query": name, "cold_sec": round(time.time() - t0, 3)}))


if __name__ == "__main__":
    main()
