"""Round-9 operators: the deterministic mergeable quantile sketch
(log2/16 histogram — DDSketch's contract, Masson/Rim/Lee VLDB'19,
with a pure-integer bucket map so both engines replay it exactly).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import sketches
from cocoindex_data_ingestion_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _exact_quantile(vals: list[int], q: float) -> int:
    k = max(1, math.ceil(q * len(vals)))
    return sorted(vals)[k - 1]


def test_qsketch_accuracy_bound(spark):
    """The selected bucket CONTAINS the exact rank-k value, so the
    midpoint representative is within the structural relative bound
    (half-width/lo <= 1/32 for values >= 32) of the exact quantile."""
    li = load_table(spark, "lineitem", SF_DIR).select(
        F.expr(
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        ).alias("v"),
        F.lit("all").alias("g"),
    )
    cells = sketches.qsketch_cells(li, ["g"], "v")
    est = sketches.qsketch_quantiles(cells, ["g"]).collect()[0]
    vals = [r["v"] for r in li.collect()]
    for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
        exact = _exact_quantile(vals, q)
        assert abs(est[col] - exact) / exact <= 1 / 32 + 1e-12, (
            q, est[col], exact,
        )


def test_qsketch_merge_equals_direct(spark):
    """Mergeability contract: cells built under an arbitrary extra
    split column and SUM-merged give IDENTICAL quantiles to cells
    built directly at the group granularity."""
    li = load_table(spark, "lineitem", SF_DIR).select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_orderkey") % 7).alias("shard"),
        F.expr(
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        ).alias("v"),
    )
    split = sketches.qsketch_quantiles(
        sketches.qsketch_cells(li, ["g", "shard"], "v"), ["g"]
    )
    direct = sketches.qsketch_quantiles(
        sketches.qsketch_cells(li, ["g"], "v"), ["g"]
    )
    a = {r["g"]: (r["n"], r["p50"], r["p95"], r["p99"])
         for r in split.collect()}
    b = {r["g"]: (r["n"], r["p50"], r["p95"], r["p99"])
         for r in direct.collect()}
    assert a == b


def test_qsketch_small_values_exact(spark):
    """Values below QSK_SMALL are their own bucket: quantiles over a
    small-value column are EXACT, not approximate."""
    df = spark.createDataFrame(
        [("a", v) for v in [1, 2, 3, 4, 5, 20, 31]], "g string, v long"
    )
    est = sketches.qsketch_quantiles(
        sketches.qsketch_cells(df, ["g"], "v"), ["g"]
    ).collect()[0]
    vals = [1, 2, 3, 4, 5, 20, 31]
    assert est["p50"] == _exact_quantile(vals, 0.5) == 4
    assert est["p99"] == _exact_quantile(vals, 0.99) == 31


def test_materialized_quantile_matches_recompute(spark, tmp_path):
    """IVM contract: insert/insert/delete refreshes land exactly where
    a from-scratch sketch over the surviving rows lands; deletes are
    exact (signed counts), and emptied cells leave the state."""
    from cocoindex_data_ingestion_spark.plans.ivm import MaterializedQuantile

    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "event_type",
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("v"),
    )
    view = MaterializedQuantile(
        spark, str(tmp_path / "qsk"), group_col="event_type", value_col="v"
    )
    view.refresh(inserts=ev.filter(F.col("event_id") % 3 != 0))
    view.refresh(inserts=ev.filter(F.col("event_id") % 3 == 0))
    view.refresh(deletes=ev.filter(F.col("event_id") % 5 == 0))

    survivors = ev.filter(F.col("event_id") % 5 != 0).withColumn(
        "g", F.col("event_type")
    )
    direct = sketches.qsketch_quantiles(
        sketches.qsketch_cells(survivors, ["g"], "v"), ["g"]
    )
    a = {r["event_type"]: (r["n"], r["p50"], r["p95"], r["p99"])
         for r in view.read_quantiles().collect()}
    b = {r["g"]: (r["n"], r["p50"], r["p95"], r["p99"])
         for r in direct.collect()}
    assert a == b
    # no zero-count cells linger after the delete fold
    assert view.read_cells().filter("cnt <= 0").count() == 0
