"""Round-10 operators: delta-join view maintenance (MaterializedJoin,
the last structural gap in the IVM family), the streaming_conf state-
partition sizing API, and the qsketch value-contract guards.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

A_SCHEMA = "ck string, aid long, av string"
B_SCHEMA = "ck string, bv string"


def _bag_join(a: Counter, b: Counter) -> dict:
    """From-scratch bag join of two side multisets: multiplicity of a
    joined row is the sum over pairings of the product of side
    multiplicities."""
    out: Counter = Counter()
    for (ck, aid, av), ma in a.items():
        for (bk, bv), mb in b.items():
            if bk == ck:
                out[(ck, aid, av, bv)] += ma * mb
    return {k: m for k, m in out.items() if m > 0}


def _apply(side: Counter, rows: list, sign: int) -> None:
    for r in rows:
        side[r] += sign


def test_materialized_join_matrix(spark, tmp_path):
    """IVM contract under the full insert/delete matrix: after every
    refresh the maintained view equals the from-scratch bag join over
    the current side multisets — including duplicate rows
    (multiplicity > 1), NULL payload values, one-sided batches, and a
    batch with deletes on BOTH sides (the ΔA⋈ΔB cross term)."""
    from cocoindex_data_ingestion_spark.plans.ivm import MaterializedJoin

    view = MaterializedJoin(
        spark, str(tmp_path / "mj"), key_col="ck",
        a_schema="aid long, av string", b_schema="bv string",
    )
    a_cur: Counter = Counter()
    b_cur: Counter = Counter()

    def df(rows, schema):
        return spark.createDataFrame(rows, schema)

    def check():
        got = {
            (r["ck"], r["aid"], r["av"], r["bv"]): r["m"]
            for r in view.read().collect()
        }
        assert got == _bag_join(a_cur, b_cur)
        # no zero/negative multiplicities linger anywhere
        assert view.view_state.read().filter("m <= 0").count() == 0
        assert view.a_state.read().filter("m <= 0").count() == 0
        assert view.b_state.read().filter("m <= 0").count() == 0

    # 1: a-side dup row (m=2) + NULL payload; b-side partial coverage
    a1 = [("1", 10, "x"), ("1", 10, "x"), ("2", 20, None)]
    b1 = [("1", "b1"), ("3", "b3")]
    view.refresh(a_inserts=df(a1, A_SCHEMA), b_inserts=df(b1, B_SCHEMA))
    _apply(a_cur, a1, +1)
    _apply(b_cur, b1, +1)
    check()

    # 2: b-only batch — key 1 gains a second b row (fan-out), key 2
    # gains its first match
    b2 = [("2", "b2"), ("1", "b1b")]
    view.refresh(b_inserts=df(b2, B_SCHEMA))
    _apply(b_cur, b2, +1)
    check()

    # 3: a-only delete of ONE copy of the dup row — multiplicities
    # drop 2 -> 1, rows survive (exact signed-count delete)
    a3 = [("1", 10, "x")]
    view.refresh(a_deletes=df(a3, A_SCHEMA))
    _apply(a_cur, a3, -1)
    check()

    # 4: deletes on BOTH sides plus an a-insert in ONE batch — key 1's
    # last a row goes while one of its b rows goes too (the cross
    # term must count the vanished pair exactly once), key 3 pairs up
    a4d = [("1", 10, "x")]
    b4d = [("1", "b1")]
    a4i = [("3", 30, "y")]
    view.refresh(
        a_inserts=df(a4i, A_SCHEMA),
        a_deletes=df(a4d, A_SCHEMA),
        b_deletes=df(b4d, B_SCHEMA),
    )
    _apply(a_cur, a4d, -1)
    _apply(b_cur, b4d, -1)
    _apply(a_cur, a4i, +1)
    check()

    # 5: delete the last b row of key 3 — its view rows vanish; the
    # view must end exactly at the final from-scratch join
    b5 = [("3", "b3")]
    view.refresh(b_deletes=df(b5, B_SCHEMA))
    _apply(b_cur, b5, -1)
    check()


def test_foreach_batch_join_cdc_exactly_once(spark, tmp_path):
    """CDC hook contract: tagged insert/delete micro-batches maintain
    the join view, and a REPLAYED batchId (Spark's failed-batch
    retry) is a no-op — the per-side fence makes the non-idempotent
    signed fold exactly-once."""
    from cocoindex_data_ingestion_spark.plans.ivm import MaterializedJoin
    from cocoindex_data_ingestion_spark.streaming.events import (
        foreach_batch_join_cdc,
    )

    view = MaterializedJoin(
        spark, str(tmp_path / "cdc"), key_col="ck",
        a_schema="aid long", b_schema="bv string",
    )
    view.refresh(
        b_inserts=spark.createDataFrame(
            [("1", "b1"), ("2", "b2")], B_SCHEMA
        )
    )
    sink = foreach_batch_join_cdc(view, side="a")
    cdc = "ck string, aid long, _op string"
    b0 = spark.createDataFrame(
        [("1", 10, "insert"), ("1", 11, "insert"), ("2", 20, "insert")],
        cdc,
    )
    b1 = spark.createDataFrame(
        [("1", 10, "delete"), ("2", 21, "insert")], cdc
    )
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replayed batch: must not double-apply
    got = {
        (r["ck"], r["aid"], r["bv"]): r["m"] for r in view.read().collect()
    }
    assert got == {
        ("1", 11, "b1"): 1,
        ("2", 20, "b2"): 1,
        ("2", 21, "b2"): 1,
    }


def test_materialized_join_validates_columns(spark, tmp_path):
    from cocoindex_data_ingestion_spark.plans.ivm import MaterializedJoin

    with pytest.raises(ValueError, match="disjoint"):
        MaterializedJoin(
            spark, str(tmp_path / "x1"), key_col="ck",
            a_schema="v long", b_schema="v string",
        )
    with pytest.raises(ValueError, match="reserved"):
        MaterializedJoin(
            spark, str(tmp_path / "x2"), key_col="ck",
            a_schema="m long", b_schema="bv string",
        )


def test_qsketch_cells_drops_nulls_and_rejects_negative(spark):
    """Value-contract enforcement (r9 advisor): NULLs are filtered
    (SQL-aggregate semantics — a NULL bucket would sort differently
    in Spark vs DuckDB), zero is a legal exact bucket, and a negative
    value raises instead of silently hashing its two's complement."""
    from cocoindex_data_ingestion_spark.operators import sketches

    ok = spark.createDataFrame(
        [("a", 0), ("a", 5), ("a", None), ("a", 100)], "g string, v long"
    )
    cells = sketches.qsketch_cells(ok, ["g"], "v").collect()
    assert sum(r["cnt"] for r in cells) == 3  # NULL dropped
    assert {r["bucket"] for r in cells} >= {0, 5}  # 0 is its own bucket

    bad = spark.createDataFrame([("a", 5), ("a", -1)], "g string, v long")
    with pytest.raises(Exception, match="non-negative"):
        sketches.qsketch_cells(bad, ["g"], "v").collect()


def test_decontaminate_bloom_equals_exact(spark):
    """The Bloom pre-filter is answer-preserving: same (doc, n_hits)
    as the plain broadcast recipe on real fixture docs, and STILL
    equal with a deliberately tiny bitset (m_bits=256 forces heavy
    false positives — the exact verify join must remove all of
    them)."""
    from cocoindex_data_ingestion_spark.operators import curation
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    exact = {
        (r["doc_id"], r["n_hits"])
        for r in curation.decontaminate(
            train, bench, "doc_id", "text", n=3
        ).collect()
    }
    assert exact  # fixture must actually produce contamination hits
    bloom = {
        (r["doc_id"], r["n_hits"])
        for r in curation.decontaminate_bloom(
            train, bench, "doc_id", "text", n=3
        ).collect()
    }
    assert bloom == exact
    fp_heavy = {
        (r["doc_id"], r["n_hits"])
        for r in curation.decontaminate_bloom(
            train, bench, "doc_id", "text", n=3, m_bits=256, k=2
        ).collect()
    }
    assert fp_heavy == exact


def test_patterns_to_glob_rejects_empty():
    from cocoindex_data_ingestion_spark.sources.cloud_specs import (
        patterns_to_glob,
    )

    assert patterns_to_glob(["*.md"]) == "*.md"
    assert patterns_to_glob(["*.md", "*.txt"]) == "{*.md,*.txt}"
    with pytest.raises(ValueError, match="empty patterns"):
        patterns_to_glob([])


def test_streaming_conf_arithmetic():
    """The sizing rule is clamp(ceil(rows*bytes/target), floor,
    ceiling) — pinned so the bench's _tuned rows are derived, not
    hand-carried."""
    from cocoindex_data_ingestion_spark.session import streaming_conf

    # pure size: 100k rows * 256 B = 25.6 MB / 8 MB target -> 4
    assert streaming_conf(100_000, 256, target_mb_per_partition=8) == {
        "spark.sql.shuffle.partitions": "4"
    }
    # tiny state: sized to 1
    assert streaming_conf(1_000, 100) == {
        "spark.sql.shuffle.partitions": "1"
    }
    # parallelism floor dominates tiny state (the Arrow-stage case)
    assert streaming_conf(1_000, 100, parallelism_floor=16) == {
        "spark.sql.shuffle.partitions": "16"
    }
    # ceiling caps huge state
    assert streaming_conf(10**9, 1024, ceiling=200) == {
        "spark.sql.shuffle.partitions": "200"
    }
    # zero keys is legal (empty stream bootstrap) -> floor
    assert streaming_conf(0, 100) == {"spark.sql.shuffle.partitions": "1"}
    with pytest.raises(ValueError):
        streaming_conf(-1, 100)
    with pytest.raises(ValueError):
        streaming_conf(10, 0)
    with pytest.raises(ValueError):
        streaming_conf(10, 10, parallelism_floor=0)
    with pytest.raises(ValueError):
        streaming_conf(10, 10, parallelism_floor=8, ceiling=4)


def test_ppr_frontier_mode_equals_filtered_default(spark):
    """drop_zero_ranks=True must return exactly the rank_fp > 0 rows
    of the default full-vector iteration — on a graph that exercises
    dangling mass (sinks), a disconnected component, re-entry of a
    node into the frontier, and a seed missing from the graph."""
    import random

    from cocoindex_data_ingestion_spark.operators import graph as graph_ops

    rng = random.Random(10)
    e = list({(rng.randint(0, 40), rng.randint(0, 40)) for _ in range(120)})
    edges = spark.createDataFrame(
        [p for p in e if p[0] != p[1]] + [(100, 101), (101, 102)],
        "src long, dst long",
    )
    for seeds in ([0, 3], [100], [7, 999]):
        full = graph_ops.ppr_fixedpoint(edges, seeds=seeds, n_iter=3)
        frontier = graph_ops.ppr_fixedpoint(
            edges, seeds=seeds, n_iter=3, drop_zero_ranks=True
        )
        a = sorted(
            map(tuple, full.filter(F.col("rank_fp") > 0).collect())
        )
        b = sorted(map(tuple, frontier.collect()))
        assert a == b, f"seeds={seeds}"


def test_spread_python_stage_guard(spark):
    """The Python-stage parallelism guard: repartitions a
    single-split small frame to the session parallelism, is a no-op
    on an already-parallel frame, and refuses to move a frame whose
    optimizer size estimate exceeds the cheap-exchange bound."""
    from cocoindex_data_ingestion_spark.functions import parallel as par

    target = spark.sparkContext.defaultParallelism
    small = spark.range(0, 1000).coalesce(1)
    assert small.rdd.getNumPartitions() == 1
    spread = par.spread_python_stage(small, "id")
    assert spread.rdd.getNumPartitions() == target
    # rows unchanged (same multiset)
    assert sorted(r.id for r in spread.collect()) == list(range(1000))

    wide = spark.range(0, 1000).repartition(max(target, 2), "id")
    assert par.spread_python_stage(wide, "id") is wide

    old = par.MAX_CHEAP_BYTES
    try:
        par.MAX_CHEAP_BYTES = 0  # everything is "too big to move"
        assert par.spread_python_stage(small, "id") is small
    finally:
        par.MAX_CHEAP_BYTES = old
