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
