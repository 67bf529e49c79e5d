"""Bucketed (co-located) table layout: shuffle-free joins at scale.

The reference has no join engine at all (SURVEY §2.8 — its only joins
are service-side id merges), so this layer is pure Spark-first scale
machinery: the fact tables a 100 TB deployment joins repeatedly
(orders ⋈ lineitem on orderkey, tracking ⋈ listing on key) are
materialized ONCE with ``bucketBy(n, key).sortBy(key)``; every
subsequent equi-join on that key then satisfies both sides'
required distribution from the on-disk layout — the physical plan
contains **no Exchange** (and with ``sortBy`` no Sort either), so the
per-query cost drops from "shuffle both tables" to "zipper-merge
co-located buckets". This is the batch analogue of the postings
index's crc32 bucket pruning (operators/indexing.py) and exactly the
layout a Delta/Iceberg deployment would declare as table properties.

Bucket-count guidance at 100 TB: pick n so a bucket of the LARGER
table is ~128-512 MB after compression (e.g. 60 TB lineitem → ~2^17
buckets); both join sides must use the same n and key. Catalyst reads
the layout from the catalog, so the optimization composes with
filters/projections pushed below the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str,
) -> None:
    """Write ``df`` as a bucketed+sorted external table registered in
    the session catalog (the catalog entry is what lets Catalyst
    trust the layout; a bare parquet dir has no bucket metadata)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
    force_merge: bool = True,
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket
    key — the shuffle elision comes from the layout, not special
    code; callers verify with ``assert_no_shuffle``.

    ``force_merge`` pins the sort-merge strategy: at 100 TB neither
    fact table is broadcastable, but on small test data Catalyst
    would pick a broadcast join and skip the bucketed scan entirely
    ("Bucketed: false (disabled by query planner)") — the hint makes
    the local plan shape match the cluster one."""
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), key, how)


_SHUFFLE_MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange RoundRobinPartitioning",
    "Exchange SinglePartition",
)


def assert_no_shuffle(df: DataFrame) -> str:
    """Return the physical plan; raise if it contains a shuffle
    exchange (broadcast exchanges are allowed — they move the small
    side, not the data) — the machine-checkable co-location
    contract."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if any(m in plan for m in _SHUFFLE_MARKERS):
        raise AssertionError(f"plan contains a shuffle:\n{plan}")
    return plan
