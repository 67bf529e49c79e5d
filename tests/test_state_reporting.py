"""State-manager reporting (app/services/state_manager.py:214-375)
over the deterministic transition-ledger double."""

import pytest
from pyspark.sql import SparkSession

from cocoindex_data_ingestion_spark.operators.state_machine import (
    ACTION_STATES,
    LEDGER_PATHS,
    STATES,
    TRANSITIONS,
    documents_requiring_action,
    fold_document_states,
    is_valid_transition,
    processing_metrics,
    simulate_transition_ledger,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("state-reporting-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_every_ledger_path_is_a_valid_walk():
    """Each simulated history must only take transitions the ported
    state machine allows (document_state.py transition table)."""
    for path in LEDGER_PATHS:
        assert path[0] == "discovered"
        for src, dst in zip(path, path[1:]):
            assert is_valid_transition(src, dst), (src, dst)


def test_every_state_is_someones_current_state():
    assert {p[-1] for p in LEDGER_PATHS} == set(STATES)


def test_fold_duration_first_processing_last_ingested(spark):
    """Path 7 retries (two processing transitions); duration must use
    the FIRST one (document_state.py:141 'if start_time is None')."""
    docs = spark.createDataFrame(
        [(i,) for i in range(len(LEDGER_PATHS))], "doc_id long"
    )
    folded = {
        r["doc_id"]: r
        for r in fold_document_states(
            simulate_transition_ledger(docs)
        ).collect()
    }
    for i, path in enumerate(LEDGER_PATHS):
        r = folded[i]
        assert r["current_state"] == path[-1]
        assert r["last_transition_ts"] == i * 100 + (len(path) - 1) * 7
        if path[-1] == "ingested":
            first_proc = path.index("processing")
            last_ing = len(path) - 1 - path[::-1].index("ingested")
            assert r["processing_duration_s"] == (last_ing - first_proc) * 7
        else:
            assert r["processing_duration_s"] is None


def test_metrics_rates_and_average(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(len(LEDGER_PATHS))], "doc_id long"
    )
    folded = fold_document_states(simulate_transition_ledger(docs))
    m = processing_metrics(folded).first()
    n = len(LEDGER_PATHS)
    assert m["total_documents"] == n
    assert m["n_ingested"] == 2
    assert m["success_rate"] == pytest.approx(2 / n)
    assert m["failure_rate"] == pytest.approx(1 / n)
    # one doc each on the plain (21 s) and retry (35 s) ingest paths
    assert m["average_processing_time"] == pytest.approx(28.0)
    assert m["documents_pending_review"] == m["n_pending_review"]
    assert m["documents_failed"] == m["n_failed"]


def test_average_is_zero_when_nothing_ingested(spark):
    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")  # paths 0,1
    m = processing_metrics(
        fold_document_states(simulate_transition_ledger(docs))
    ).first()
    assert m["n_ingested"] == 0
    assert m["average_processing_time"] == 0.0


def test_requiring_action_filter_and_cap(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(80)], "doc_id long"
    )
    folded = fold_document_states(simulate_transition_ledger(docs))
    out = documents_requiring_action(folded, limit=5).collect()
    assert len(out) == 5
    ids = [r["doc_id"] for r in out]
    assert ids == sorted(ids)
    for r in out:
        assert r["status"] in ACTION_STATES
    # lowest-id-first determinization: first action doc is id 2
    # (path 2 ends failed; paths 0/1 are not action states)
    assert ids[0] == 2


def test_transitions_table_unchanged():
    """The reporting layer leans on the 7-state machine staying the
    reference's (document_state.py:11-135)."""
    assert set(TRANSITIONS) == set(STATES)
    assert TRANSITIONS["ingested"] == ()
    assert TRANSITIONS["failed"] == ("processing",)
    assert TRANSITIONS["rejected"] == ("processing",)


# -- SSE change events (app/api/sse.py:81-162) ---------------------------------


def test_sse_dedups_repeat_observations(spark):
    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.operators.state_machine import (
        simulate_transition_ledger, sse_events_from_polls,
    )

    docs = spark.createDataFrame([(7,)], "doc_id long")  # retry path
    ledger = simulate_transition_ledger(docs)
    polls = ledger.select(
        "doc_id", "seq",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("tick"),
        "to_state",
    )
    events = sse_events_from_polls(polls).orderBy("seq", "tick").collect()
    # every transition emits exactly once (the tick-1 duplicate is
    # suppressed), including the very first observation
    assert [e["status"] for e in events] == list(LEDGER_PATHS[7])
    assert all(e["tick"] == 0 for e in events)


def test_sse_event_type_mapping_quirk(spark):
    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.operators.state_machine import (
        sse_event_type_col,
    )

    rows = spark.createDataFrame(
        [(s,) for s in (
            "processing", "failed", "pending_review", "ingested",
            "discovered", "approved", "complete",
        )],
        "st string",
    ).select("st", sse_event_type_col("st").alias("ev")).collect()
    got = {r["st"]: r["ev"] for r in rows}
    assert got["processing"] == "processing_started"
    assert got["failed"] == "processing_failed"
    assert got["pending_review"] == "review_required"
    # the dead arm: 'ingested' is NOT mapped to processing_complete —
    # the reference branches on 'complete', which never occurs
    assert got["ingested"] == "status_update"
    assert got["discovered"] == "status_update"
    assert got["approved"] == "status_update"
    assert got["complete"] == "processing_complete"
