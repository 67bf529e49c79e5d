"""Mergeable sketch rollups: the pre-aggregated path for distinct
counts and quantiles at 100 TB.

The reference computes corpus statistics by full recount
(app/services/search_service.py stats, neo4j get_statistics); at
scale the standard design is a **sketch table**: one
Apache-DataSketches HLL per (dimension, day) materialized once, and
every ad-hoc range/rollup query answered by UNIONING sketches —
O(cells read), never O(events), with the sketch union exact w.r.t.
the per-cell sketches (HLL union loses no additional accuracy).

Spark 4 ships the DataSketches family as native expressions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the whole path is JVM-side codegen — no UDFs. DuckDB has no
binary-compatible sketch, so registry exposure is rows-only; the
accuracy contract (relative error vs exact distinct within the HLL
lgK bound) is pinned in tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_table(
    df: DataFrame,
    cell_cols: list[str],
    distinct_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Materialize one HLL sketch per cell — the table a deployment
    writes incrementally (sketches of new partitions union into
    place; no read-modify-write of raw data)."""
    return df.groupBy(*[F.col(c) for c in cell_cols]).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def rollup_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Approx distinct over any rollup of the cell grid by unioning
    cell sketches (group_cols=None → grand total)."""
    est: Column = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))
    ).alias("approx_distinct")
    n = F.sum("n_rows").alias("n_rows")
    if group_cols:
        return sketches.groupBy(*[F.col(c) for c in group_cols]).agg(est, n)
    return sketches.agg(est, n)
