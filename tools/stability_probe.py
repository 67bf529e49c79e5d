"""Partition-variance stability probe for oracle-compared queries.

The round-1 flake (`events_sessionize`) was float-associativity:
``sum(double)`` accumulates in partition-dependent order, so a value
within 1 ulp of a rounding boundary flipped between runs. The fix is
structural (``functions/compare.py::stable_sum`` — exact fixed-point
integer sums), and THIS probe is the regression check: every
sum-carrying oracled query re-runs under several
``spark.sql.shuffle.partitions`` settings (different partitioning =
different accumulation order) and must produce the identical
normalized row multiset as the DuckDB oracle each time.

Usage: python tools/stability_probe.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import TABLES
from tools.check_correctness import _normalize

# Every oracled query whose output contains an aggregated double.
SUM_QUERIES = [
    "events_sessionize",
    "events_tumbling_window",
    "events_sliding_window",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_volume_customers",
    "q19_or_predicates",
    "q22_dormant_customers",
    "salted_agg_events",
    "rollup_customers",
    "cube_lineitem",
    "grouping_sets_orders",
    "window_running_aggs",
    "percentile_stats",
    "corpus_stats",
    "bm25_search",
    "weighted_fusion",
]

PARTITION_SETTINGS = (5, 17, 32)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or SUM_QUERIES

    spark = get_spark("stability_probe")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name in names:
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        expect = _normalize(res.fetchall(), ocols)
        bad = []
        for p in PARTITION_SETTINGS:
            spark.conf.set("spark.sql.shuffle.partitions", str(p))
            sdf = qs[name](spark, sf_dir)
            got = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
            if got != expect:
                bad.append(p)
        status = "STABLE" if not bad else f"FLAKY at partitions={bad}"
        print(f"  {name:28s} {status}")
        if bad:
            failures.append(name)

    print()
    if failures:
        print(f"FLAKY: {failures}")
        return 1
    print(f"all {len(names)} queries stable across partitions "
          f"{PARTITION_SETTINGS}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
