"""Document state machine.

Reference: app/models/document_state.py:11-135 — 7 states with
enforced transitions, retry/terminal logic:

    discovered → processing → pending_review → approved → ingested
                    ↓              ↓             ↓
                  failed        rejected      (terminal: ingested)
    failed → processing (retry) ; rejected → processing (revise)

Spark form: state is a column; a transition is a validated
CASE-expression update. Invalid transitions either raise (strict
driver-side validation) or are annotated, never silently applied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATES = (
    "discovered", "processing", "pending_review", "approved",
    "ingested", "failed", "rejected",
)

# state -> allowed next states (document_state.py transition table)
TRANSITIONS: dict[str, tuple[str, ...]] = {
    "discovered": ("processing",),
    "processing": ("pending_review", "failed"),
    "pending_review": ("approved", "rejected"),
    "approved": ("ingested",),
    "ingested": (),  # terminal
    "failed": ("processing",),  # retry
    "rejected": ("processing",),  # revise + retry
}

TERMINAL_STATES = ("ingested",)


def is_valid_transition(src: str, dst: str) -> bool:
    return dst in TRANSITIONS.get(src, ())


def transition(
    df: DataFrame,
    to_state: str,
    condition: Column | None = None,
    state_col: str = "status",
) -> DataFrame:
    """Apply a validated transition: rows matching ``condition`` (and
    in a state allowed to move to ``to_state``) get the new state;
    rows matching the condition from a *disallowed* state are left
    unchanged and flagged in ``_invalid_transition``."""
    if to_state not in STATES:
        raise ValueError(f"unknown state '{to_state}'")
    allowed_srcs = [s for s, dsts in TRANSITIONS.items() if to_state in dsts]
    cond = condition if condition is not None else F.lit(True)
    can_move = F.col(state_col).isin(allowed_srcs)
    return df.withColumn(
        "_invalid_transition",
        F.when(cond & ~can_move & (F.col(state_col) != to_state), True).otherwise(
            F.coalesce(F.col("_invalid_transition"), F.lit(False))
            if "_invalid_transition" in df.columns
            else F.lit(False)
        ),
    ).withColumn(
        state_col,
        F.when(cond & can_move, F.lit(to_state)).otherwise(F.col(state_col)),
    )


def assert_no_invalid(df: DataFrame) -> None:
    if "_invalid_transition" not in df.columns:
        return
    n = df.filter(F.col("_invalid_transition")).limit(1).count()
    if n:
        raise ValueError("invalid state transition attempted")


# -- state-manager reporting (app/services/state_manager.py:214-375) ----------

# Eight representative VALID walks through the transition table — the
# deterministic double for per-document transition histories (the
# reference reads these from the state_transitions table). Every path
# starts at discovered and every state occurs as SOME document's
# current state; 3 and 7 exercise the failed→processing retry, 7
# additionally pins "first processing, last ingested" in
# get_processing_duration (document_state.py:131-150).
LEDGER_PATHS: tuple[tuple[str, ...], ...] = (
    ("discovered",),
    ("discovered", "processing"),
    ("discovered", "processing", "failed"),
    ("discovered", "processing", "failed", "processing", "pending_review"),
    ("discovered", "processing", "pending_review", "rejected"),
    ("discovered", "processing", "pending_review", "approved"),
    ("discovered", "processing", "pending_review", "approved", "ingested"),
    ("discovered", "processing", "failed", "processing", "pending_review",
     "approved", "ingested"),
)

# States whose documents need user attention
# (state_manager.py:238-265 get_documents_requiring_action)
ACTION_STATES = ("pending_review", "failed", "rejected")

_LEDGER_STEP_S = 7  # seconds between consecutive transitions


def simulate_transition_ledger(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic transition-history double: document ``i`` walks
    ``LEDGER_PATHS[i % len(LEDGER_PATHS)]`` with transition ``k``
    stamped at epoch second ``i*100 + k*7``. Expression-only (element_at over a literal
    array-of-arrays + posexplode) — no shuffle; the real deployment
    replaces this with a scan of the state_transitions table."""
    paths = F.array(*[
        F.array(*[F.lit(s) for s in p]) for p in LEDGER_PATHS
    ])
    path = F.element_at(paths, (F.col(id_col) % len(LEDGER_PATHS) + 1).cast("int"))
    return (
        docs.select(F.col(id_col), path.alias("_path"))
        .select(id_col, F.posexplode("_path").alias("seq", "to_state"))
        .select(
            id_col,
            F.col("seq").cast("long").alias("seq"),
            "to_state",
            (F.col(id_col) * 100 + F.col("seq") * _LEDGER_STEP_S)
            .cast("long")
            .alias("ts"),
        )
    )


def fold_document_states(
    ledger: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document fold of a transition ledger (columns id, seq,
    to_state, ts): current state = last transition; processing
    duration (document_state.py:131-150) = last ingested ts − FIRST
    processing ts, defined only for documents currently INGESTED.
    One grouped pass — map-side combinable, no per-doc history held
    on the driver."""
    return ledger.groupBy(id_col).agg(
        F.max_by("to_state", "seq").alias("current_state"),
        F.max("ts").alias("last_transition_ts"),
        F.min(
            F.when(F.col("to_state") == "processing", F.col("ts"))
        ).alias("_first_processing_ts"),
        F.max(
            F.when(F.col("to_state") == "ingested", F.col("ts"))
        ).alias("_last_ingested_ts"),
    ).withColumn(
        "processing_duration_s",
        F.when(
            (F.col("current_state") == "ingested")
            & F.col("_first_processing_ts").isNotNull()
            & F.col("_last_ingested_ts").isNotNull(),
            F.col("_last_ingested_ts") - F.col("_first_processing_ts"),
        ).cast("long"),
    ).drop("_first_processing_ts", "_last_ingested_ts")


def processing_metrics(folded: DataFrame) -> DataFrame:
    """``get_processing_metrics`` (state_manager.py:342-375) as one
    global aggregation over the per-document fold: per-state counts
    (get_state_statistics :268-287), total, success/failure rates
    against max(total, 1), mean processing duration over ingested
    documents (0.0 when none). Deviation noted: the reference caps
    the duration scan at the first 1000 ingested rows its DB returns
    (an arbitrary-order pagination artifact); this port averages over
    ALL ingested documents."""
    cur = F.col("current_state")
    aggs = [
        F.sum(F.when(cur == s, 1).otherwise(0)).cast("long").alias(f"n_{s}")
        for s in STATES
    ]
    aggs += [
        F.count("*").cast("long").alias("total_documents"),
        F.avg("processing_duration_s").alias("_avg_dur"),
    ]
    out = folded.agg(*aggs)
    total = F.greatest(F.col("total_documents"), F.lit(1))
    return out.select(
        *[f"n_{s}" for s in STATES],
        "total_documents",
        (F.col("n_ingested") / total).alias("success_rate"),
        (F.col("n_failed") / total).alias("failure_rate"),
        F.coalesce(F.col("_avg_dur"), F.lit(0.0)).alias(
            "average_processing_time"
        ),
        F.col("n_pending_review").alias("documents_pending_review"),
        F.col("n_failed").alias("documents_failed"),
    )


def documents_requiring_action(
    folded: DataFrame, id_col: str = "doc_id", limit: int = 100
) -> DataFrame:
    """``get_documents_requiring_action`` (:238-265): documents whose
    CURRENT state is pending_review/failed/rejected, capped at
    ``limit``. The reference's cap rides the DB's arbitrary row
    order; this port determinizes it as lowest-id-first (documented
    canonicalization, matching the oracle)."""
    return (
        folded.filter(F.col("current_state").isin(*ACTION_STATES))
        .select(id_col, F.col("current_state").alias("status"),
                "last_transition_ts")
        .orderBy(id_col)
        .limit(limit)
    )


# -- SSE change-event stream (app/api/sse.py:81-162) ---------------------------

# status → SSE event type (sse.py:133-143). QUIRK PRESERVED: the
# branch tests 'complete', a value the 7-state machine never
# produces, so a document reaching 'ingested' emits the generic
# 'status_update' — despite the module docstring promising
# 'processing_complete' for ingested.
SSE_EVENT_TYPES = {
    "processing": "processing_started",
    "complete": "processing_complete",  # dead arm (no such state)
    "failed": "processing_failed",
    "pending_review": "review_required",
}
SSE_DEFAULT_EVENT = "status_update"


def sse_event_type_col(status_col) -> Column:
    c = F.col(status_col) if isinstance(status_col, str) else status_col
    out = F.lit(SSE_DEFAULT_EVENT)
    for status, ev in reversed(list(SSE_EVENT_TYPES.items())):
        out = F.when(c == status, F.lit(ev)).otherwise(out)
    return out


def sse_events_from_polls(
    polls: DataFrame,
    id_col: str = "doc_id",
    order_cols: tuple[str, ...] = ("seq", "tick"),
    state_col: str = "to_state",
) -> DataFrame:
    """The SSE generator's last_states dedup (sse.py:118-146) in
    batch form: given per-document poll snapshots, emit one event per
    OBSERVED STATE CHANGE — the first snapshot always emits (the doc
    is not in last_states yet), repeat observations of the same state
    emit nothing. One window pass partitioned by document; no
    cross-document state."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(*[F.col(c) for c in order_cols])
    prev = F.lag(state_col).over(w)
    return (
        polls.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
        .select(
            id_col,
            *order_cols,
            F.col(state_col).alias("status"),
            sse_event_type_col(state_col).alias("event_type"),
        )
    )
