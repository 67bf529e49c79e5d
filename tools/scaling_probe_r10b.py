"""MaterializedJoin refresh-cost probe: grow the BASE relation
1×/10×/50× while holding the delta batch FIXED, and measure (a) the
bulk load, (b) a KEY-SPREAD small refresh (2,000 distinct join keys
— touches essentially every bucket), and (c) a KEY-LOCAL small
refresh (20 distinct join keys — touches <=20 of 256 buckets). The
claim under test is the refresh contract's REAL shape: cost is
O(|delta| + Σ size of touched buckets). A delta whose keys spread
across every bucket degenerates to a full-state rewrite — the same
copy-on-write granularity cost Delta/Iceberg pay without deletion
vectors — while a key-local delta rewrites only its buckets and
stays ~flat as the base grows 50×. The sizing rule this probe
demonstrates: bucket count must be large relative to per-batch
distinct keys (so rewrite volume ≈ keys × bucket_size, independent
of state), exactly like shuffle-partition sizing.

Methodology follows tools/scaling_probe_r10.py (flat materialized
parquet per factor, warm repeat: structurally identical deltas are
applied and the SECOND timing is reported — the first also absorbs
JVM/codegen warmup for the refresh path).

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
    print(
        "| factor | base orders | bulk load (s) |"
        " spread-delta refresh (s) | local-delta refresh (s) |"
    )
    print("|---|---|---|---|---|")
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
                n_buckets=256,
            )
            t_bulk = timed(
                lambda: view.refresh(a_inserts=a, b_inserts=cust)
            )

            def delta_refresh(shift: int, n_keys: int | None = None):
                ins = orders0
                if n_keys is not None:
                    ins = ins.filter(F.col("custkey") % 750 == 0)
                ins = ins.limit(DELTA_ROWS).withColumn(
                    "o_orderkey", F.col("o_orderkey") + shift
                )
                view.refresh(a_inserts=ins)

            timed(lambda: delta_refresh(900_000_000))  # warm, discarded
            t_spread = timed(lambda: delta_refresh(950_000_000))
            timed(lambda: delta_refresh(960_000_000, n_keys=20))
            t_local = timed(lambda: delta_refresh(970_000_000, n_keys=20))
            print(
                f"| {factor} | {n} | {t_bulk} | {t_spread} | {t_local} |",
                flush=True,
            )
            shutil.rmtree(fdir, ignore_errors=True)
    finally:
        shutil.rmtree(base_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
