"""Partition-variance stability probe for oracle-compared queries.

The round-1 flake (`events_sessionize`) was float-associativity:
``sum(double)`` accumulates in partition-dependent order, so a value
within 1 ulp of a rounding boundary flipped between runs. The fix is
structural (``functions/compare.py::stable_sum`` — exact fixed-point
integer sums), and THIS probe is the regression check: every oracled
query re-runs under several ``spark.sql.shuffle.partitions`` settings
(different partitioning = different accumulation order) and must
produce the identical normalized row multiset as the DuckDB oracle
each time.

Coverage is automatic: the default query set is EVERY entry of
``oracle_sql()`` — a new oracled query is partition-variance checked
the moment it is registered (tests/test_stability_probe.py runs this
in the default pytest suite, marked slow).

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

PARTITION_SETTINGS = (5, 17, 32)


def run_probe(
    sf_dir: str,
    names: list[str] | None = None,
    partition_settings: tuple[int, ...] = PARTITION_SETTINGS,
    verbose: bool = True,
) -> list[str]:
    """Returns the list of FLAKY query names (empty = all stable)."""
    spark = get_spark("stability_probe")
    default_partitions = spark.conf.get("spark.sql.shuffle.partitions")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names if names else list(oracles)
    failures = []
    try:
        for name in names:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            expect = _normalize(res.fetchall(), ocols)
            bad = []
            for p in partition_settings:
                spark.conf.set("spark.sql.shuffle.partitions", str(p))
                sdf = qs[name](spark, sf_dir)
                got = _normalize([tuple(r) for r in sdf.collect()], sdf.columns)
                if got != expect:
                    bad.append(p)
            if verbose:
                status = "STABLE" if not bad else f"FLAKY at partitions={bad}"
                print(f"  {name:28s} {status}")
            if bad:
                failures.append(name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default_partitions)
        con.close()
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None

    failures = run_probe(sf_dir, names)
    print()
    if failures:
        print(f"FLAKY: {failures}")
        return 1
    print(f"all queries stable across partitions {PARTITION_SETTINGS}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
