"""Job-ledger fold (job_tracker.py:29-125): update/cancel semantics
on hand-built event sequences."""

from __future__ import annotations

from cocoindex_data_ingestion_spark.operators.jobs import job_ledger

SCHEMA = (
    "job_id long, ts long, seq long, status string, progress long, "
    "message string, error string"
)


def _fold(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["job_id"]: r.asDict() for r in job_ledger(df).collect()}


def test_progress_clamp_and_completed_forces_100(spark):
    out = _fold(
        spark,
        [
            (1, 10, 1, "running", 250, None, None),   # clamps to 100
            (1, 20, 2, "running", -5, None, None),    # clamps to 0
            (2, 10, 1, "running", 40, None, None),
            (2, 20, 2, "completed", 40, None, None),  # completed wins: 100
        ],
    )
    assert out[1]["progress"] == 0
    assert out[2]["progress"] == 100
    assert out[2]["status"] == "completed"
    assert out[2]["completed_at"] == 20


def test_cancel_refused_when_terminal(spark):
    out = _fold(
        spark,
        [
            (1, 10, 1, "completed", None, None, None),
            (1, 20, 2, "cancelled", None, None, None),  # refused (:117-118)
        ],
    )
    assert out[1]["status"] == "completed"
    assert out[1]["completed_at"] == 10
    assert out[1]["message"] == "Job queued"


def test_valid_cancel_sets_message_not_updated_at(spark):
    out = _fold(
        spark,
        [
            (1, 10, 1, "running", 30, "working", None),
            (1, 20, 2, "cancelled", None, None, None),
        ],
    )
    j = out[1]
    assert j["status"] == "cancelled"
    assert j["message"] == "Job cancelled by user"
    assert j["completed_at"] == 20
    # cancel_job does NOT stamp updated_at (:111-125)
    assert j["updated_at"] == 10
    assert j["progress"] == 30


def test_second_cancel_in_segment_refused(spark):
    out = _fold(
        spark,
        [
            (1, 10, 1, "running", None, None, None),
            (1, 20, 2, "cancelled", None, None, None),  # valid
            (1, 30, 3, "cancelled", None, None, None),  # refused: terminal
        ],
    )
    assert out[1]["status"] == "cancelled"
    assert out[1]["completed_at"] == 20


def test_update_after_cancel_reopens_then_cancel_valid_again(spark):
    # update_job sets status unconditionally (:63) — a later running
    # update "reopens" the job, and the next cancel counts again
    out = _fold(
        spark,
        [
            (1, 10, 1, "cancelled", None, None, None),  # valid (queued)
            (1, 20, 2, "running", 10, None, None),
            (1, 30, 3, "cancelled", None, None, None),  # valid again
        ],
    )
    assert out[1]["status"] == "cancelled"
    assert out[1]["completed_at"] == 30
    assert out[1]["updated_at"] == 20


def test_completed_at_not_cleared_by_later_update(spark):
    out = _fold(
        spark,
        [
            (1, 10, 1, "failed", None, None, "boom"),
            (1, 20, 2, "running", 5, "retrying", None),
        ],
    )
    j = out[1]
    assert j["status"] == "running"
    assert j["completed_at"] == 10   # faithful quirk (:75-76)
    assert j["error"] == "boom"      # error not cleared either (:70-71)
    assert j["message"] == "retrying"
    assert j["progress"] == 5


def test_defaults(spark):
    out = _fold(spark, [(1, 10, 1, "running", None, None, None)])
    j = out[1]
    assert j["progress"] == 0
    assert j["message"] == "Job queued"
    assert j["error"] is None
    assert j["completed_at"] is None
    assert (j["created_at"], j["updated_at"]) == (10, 10)
