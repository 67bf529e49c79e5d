"""MaterializedJoin refresh-cost probe: grow the BASE relation
1×/10×/50× while holding the delta batch FIXED, and measure (a) the
bulk load and (b) a small mixed insert+delete refresh. The 100 TB
claim under test is the IVM contract itself — refresh cost is
O(|delta| + matching other-side rows + touched buckets), NOT
O(view): the delta-refresh row should stay ~flat as the base grows
50×, while the bulk load is allowed to grow linearly (it IS the
data).

Methodology follows tools/scaling_probe_r10.py (flat materialized
parquet per factor, warm repeat: two structurally identical small
deltas are applied and the SECOND one is reported — the first also
absorbs JVM/codegen warmup for the refresh path).

Usage: python tools/scaling_probe_r10b.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.plans.ivm import MaterializedJoin
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table
from tools.scaling_probe_r7c import SF_DIR, scaled, timed

FACTORS = (1, 10, 50)
DELTA_ROWS = 2_000  # fixed-size delta regardless of base factor


def main() -> None:
    spark = get_spark("scaling_probe_r10b")
    base_dir = tempfile.mkdtemp(prefix="scaling_r10b_")
    orders0 = load_table(spark, "orders", SF_DIR).select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.expr(
            "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
        ).alias("total_cents"),
    )
    cust = load_table(spark, "customer", SF_DIR).select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    print("| factor | base orders | bulk load (s) | fixed-delta refresh (s) |")
    print("|---|---|---|---|")
    try:
        for factor in FACTORS:
            fdir = f"{base_dir}/f{factor}"
            scaled(orders0, "o_orderkey", factor, 100_000_000).write.parquet(
                f"{fdir}/orders"
            )
            a = spark.read.parquet(f"{fdir}/orders")
            n = a.count()
            view = MaterializedJoin(
                spark, f"{fdir}/view", key_col="custkey",
                a_schema="o_orderkey bigint, total_cents bigint",
                b_schema="c_mktsegment string",
            )
            t_bulk = timed(
                lambda: view.refresh(a_inserts=a, b_inserts=cust)
            )

            def delta_refresh(shift: int):
                ins = orders0.limit(DELTA_ROWS).withColumn(
                    "o_orderkey", F.col("o_orderkey") + shift
                )
                dels = a.limit(DELTA_ROWS // 2)
                view.refresh(a_inserts=ins, a_deletes=dels)

            timed(lambda: delta_refresh(900_000_000))  # warm, discarded
            t_delta = timed(lambda: delta_refresh(950_000_000))
            print(
                f"| {factor} | {n} | {t_bulk} | {t_delta} |", flush=True
            )
            shutil.rmtree(fdir, ignore_errors=True)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
