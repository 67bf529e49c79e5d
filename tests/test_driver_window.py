"""Driver-window rotation plan invariants (r7 verdict directive #6).

The r7 judge flagged that the rotation plan lived in a hand-written
source comment and had silently orphaned `chunk_semantic` (oracled
since r6, in no parked list). The plan is now the generated
``driver_window.json`` artifact; these tests make the orphan failure
mode structurally impossible:

* every ORACLED registry entry is either already driver-verified
  (green in some CORRECTNESS_r*.json) or scheduled inside the next
  driver window — never floating;
* the artifact is in sync with the registry (regenerating it is a
  no-op), so adding an oracle without rescheduling fails CI;
* the entry's ``queries()`` order actually honors the artifact.
"""

from __future__ import annotations

import glob
import json
import os

import __spark_entry__ as entrymod
from tools.gen_driver_window import build_plan, _verification_history

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "driver_window.json")


def _load():
    with open(ARTIFACT) as f:
        return json.load(f)


def test_artifact_exists_and_sized():
    plan = _load()
    assert plan["window_size"] == 50
    assert len(plan["window"]) == 50
    assert len(set(plan["window"])) == 50


def test_no_oracled_entry_is_orphaned():
    """Every oracled query: driver-verified already OR in the window.

    (`scheduled_later` entries are acceptable only if already
    verified — a never-verified oracle outside the window is exactly
    the chunk_semantic bug.)
    """
    plan = _load()
    verified = set(_verification_history())
    windowed = set(plan["window"])
    oracled = {n for n, (_f, sql) in entrymod._REGISTRY.items() if sql is not None}
    orphans = sorted(oracled - verified - windowed)
    assert not orphans, f"never-verified oracles outside the window: {orphans}"


def test_artifact_in_sync_with_registry():
    """Regenerating the plan yields the committed artifact — i.e. the
    registry didn't drift (new/renamed oracle without regenerating)."""
    plan = _load()
    fresh = build_plan(plan["round"])
    for key in ("window", "scheduled_later", "rows_only", "never_verified"):
        assert fresh[key] == plan[key], (
            f"driver_window.json stale on {key!r} — rerun "
            f"tools/gen_driver_window.py"
        )


def test_entry_order_honors_artifact():
    plan = _load()
    names = list(entrymod.queries())
    assert names[: len(plan["window"])] == plan["window"]
    oracled_names = [n for n in names if entrymod._REGISTRY[n][1] is not None]
    assert oracled_names == plan["window"] + plan["scheduled_later"]


def test_rows_only_documented():
    plan = _load()
    rows_only = {n for n, (_f, sql) in entrymod._REGISTRY.items() if sql is None}
    assert set(plan["rows_only"]) == rows_only


def test_staleness_bound():
    """No oracled entry goes more than MAX_STALENESS_ROUNDS rounds
    without driver verification (r8 verdict directive #3).

    Two layers: (a) the committed artifact's window contains every
    entry at-or-past the bound relative to the plan's round — so a
    stale artifact can't hide an overdue entry; (b) build_plan()
    raises on violation (exercised by calling it fresh), so watch/
    canary growth can only fail loudly at generation time, never
    silently starve the LRU fill (the r7 chunk_semantic failure
    mode)."""
    plan = _load()
    k = plan["max_staleness_rounds"]
    assert k <= 8, "bound loosened past the documented LRU cycle"
    round_no = plan["round"]
    latest = _verification_history(before_round=round_no)
    windowed = set(plan["window"])
    oracled = {n for n, (_f, sql) in entrymod._REGISTRY.items() if sql is not None}
    overdue = sorted(
        n
        for n in oracled
        if round_no - latest.get(n, round_no) >= k and n not in windowed
    )
    assert not overdue, f"entries past the staleness bound, unscheduled: {overdue}"
    # (b) generation-time guard is live: build_plan for this round
    # succeeds (it would SystemExit on violation).
    build_plan(round_no)


def test_correctness_history_parses():
    files = glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    assert files, "no CORRECTNESS artifacts found"
    hist = _verification_history()
    assert len(hist) >= 250
