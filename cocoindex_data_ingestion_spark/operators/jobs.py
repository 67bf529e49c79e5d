"""Job-ledger materialization: event-sourced async-task state.

Reference behavior (app/services/job_tracker.py): an in-memory job
table mutated by API calls —
- ``create_job`` (:29-46): status queued, progress 0, message
  'Job queued'.
- ``update_job`` (:48-81): sets status unconditionally and stamps
  ``updated_at``; message/progress/error apply only when provided;
  progress clamps to [0, 100]; entering a terminal status
  (completed/failed/cancelled) stamps ``completed_at``, and COMPLETED
  forces progress 100. A later non-terminal update does NOT clear
  ``completed_at`` (faithful quirk).
- ``cancel_job`` (:111-125): REFUSED when the job is already
  terminal; otherwise sets status cancelled, stamps ``completed_at``
  and the message — but NOT ``updated_at`` (faithful quirk).

Spark-first: the tracker's mutable dict becomes a FOLD over an
update-event table — the batch twin of a keyed streaming upsert. Each
field's final value is "last assignment wins" with a field-specific
setter predicate, computed as ``last(CASE WHEN setter THEN value END)
IGNORE NULLS`` over one full-frame ordered window per job, then one
groupBy collapses to a row per job. Cancel validity (the only
history-dependent rule: a cancel counts only when the job is not yet
terminal) is a second window: the last preceding update's status
segments the cancels, and only the first cancel of a non-terminal
segment is effective.

Modeling note: rows with ``status = 'cancelled'`` are treated as
``cancel_job`` CALLS (guarded); every other row is an unconditional
``update_job``. All windows partition by job id — per-job state only,
one exchange, no skew beyond per-job event counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TERMINAL = ["completed", "failed", "cancelled"]
CANCEL_MESSAGE = "Job cancelled by user"  # job_tracker.py:122
DEFAULT_MESSAGE = "Job queued"  # :36


def job_ledger(
    updates: DataFrame,
    job_col: str = "job_id",
    ts_col: str = "ts",
    seq_col: str = "seq",
    status_col: str = "status",
    progress_col: str = "progress",
    message_col: str = "message",
    error_col: str = "error",
) -> DataFrame:
    """Fold an update-event table into the latest job row:
    ``(job_id, status, progress, message, error, created_at,
    updated_at, completed_at)``."""
    job, ts, seq = F.col(job_col), F.col(ts_col), F.col(seq_col)
    status = F.col(status_col)
    progress = F.col(progress_col)
    message = F.col(message_col)
    error = F.col(error_col)

    is_cancel = status == "cancelled"
    is_update = ~is_cancel

    w_prev = (
        Window.partitionBy(job_col)
        .orderBy(ts_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ann = updates.withColumn(
        "__prev_upd_status",
        F.last(F.when(is_update, status), ignorenulls=True).over(w_prev),
    ).withColumn(
        "__prev_upd_seq",
        F.last(F.when(is_update, seq), ignorenulls=True).over(w_prev),
    )
    w_seg = Window.partitionBy(
        job_col, F.coalesce(F.col("__prev_upd_seq"), F.lit(-1)), is_cancel
    ).orderBy(ts_col, seq_col)
    ann = ann.withColumn(
        "__rn_seg", F.when(is_cancel, F.row_number().over(w_seg))
    ).withColumn(
        "__valid_cancel",
        is_cancel
        & (F.col("__rn_seg") == 1)
        & (
            F.col("__prev_upd_status").isNull()
            | ~F.col("__prev_upd_status").isin(TERMINAL)
        ),
    )
    effective = is_update | F.col("__valid_cancel")

    clamp = F.least(F.lit(100), F.greatest(F.lit(0), progress)).cast("long")
    progress_set = is_update & (
        progress.isNotNull() | (status == "completed")
    )
    progress_val = F.when(status == "completed", F.lit(100).cast("long")).otherwise(
        clamp
    )
    message_val = F.when(
        is_update & message.isNotNull(), message
    ).when(F.col("__valid_cancel"), F.lit(CANCEL_MESSAGE))
    completed_set = (is_update & status.isin(TERMINAL)) | F.col(
        "__valid_cancel"
    )

    w_full = (
        Window.partitionBy(job_col)
        .orderBy(ts_col, seq_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    last_nn = lambda c: F.last(c, ignorenulls=True).over(w_full)  # noqa: E731
    folded = ann.select(
        job,
        ts,
        is_update.alias("__is_update"),
        last_nn(F.when(effective, status)).alias("__status"),
        last_nn(F.when(progress_set, progress_val)).alias("__progress"),
        last_nn(message_val).alias("__message"),
        last_nn(F.when(is_update & error.isNotNull(), error)).alias(
            "__error"
        ),
        F.when(completed_set, ts).alias("__completed_ts"),
    )
    return folded.groupBy(job_col).agg(
        F.max("__status").alias("status"),
        F.coalesce(F.max("__progress"), F.lit(0).cast("long")).alias(
            "progress"
        ),
        F.coalesce(F.max("__message"), F.lit(DEFAULT_MESSAGE)).alias(
            "message"
        ),
        F.max("__error").alias("error"),
        F.min(ts_col).alias("created_at"),
        F.max(F.when(F.col("__is_update"), ts)).alias("updated_at"),
        F.max("__completed_ts").alias("completed_at"),
    )
