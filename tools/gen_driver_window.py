"""Generate ``driver_window.json`` — the driver-window rotation plan.

Round 7's verdict flagged that the rotation plan lived in a source
comment inside ``__spark_entry__.py`` (the parked-oracle block), and
that `chunk_semantic` was silently orphaned by it: oracled since
round 6 but in no parked list, so `_ordered_names()` would never have
scheduled it. This tool makes that failure mode impossible by
DERIVING the plan from ground truth instead of hand-maintaining it:

1. **never-verified oracles** — every oracled registry entry that has
   no green row in any ``CORRECTNESS_r*.json`` — go first. Nothing can
   be orphaned because the set is computed, not curated.
2. **canaries** — two queries green in every prior round, kept in
   every window as a harness-health check.
3. **watches** — hand-declared regression watches for code paths
   touched this round (see ``WATCHES`` below).
4. **LRU fill** — remaining slots go to the least-recently-verified
   oracles, so over rounds the whole registry keeps re-rotating.

``__spark_entry__.py`` loads the artifact and builds its window
priority from ``window`` + ``scheduled_later``;
``tests/test_driver_window.py`` asserts the no-orphan invariant.

Usage: python tools/gen_driver_window.py [--round N]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW_SIZE = 50

CANARIES = ["hybrid_rrf", "q1_pricing_summary"]

# Regression watches for round 10: the four SLO flagships (always
# worth a driver re-check after any entry rework) plus the two
# quantile-sketch rows whose shared oracle body changed this round
# (the q-literal CAST-to-DOUBLE fix in `_qsk_quantile_sql` and the
# value-contract guard in qsketch_cells touch both their Spark and
# DuckDB sides). The r9 bench-drift watches (graph_reachability_cte,
# corpus_qq_table) are dropped: both were re-verified green in r9 and
# the drift was root-caused to a host window, not their code.
WATCHES = [
    "indexed_hybrid_rrf",
    "indexed_vector_knn",
    "indexed_bm25_search",
    "indexed_graph_reachability",
    "quantile_sketch_rollup",
    "ivm_quantile_sketch",
]

# Staleness bound (r8 verdict directive #3): no oracled entry may go
# more than MAX_STALENESS_ROUNDS rounds without driver verification.
# Steady-state LRU cycle = ceil((|registry| - |canaries|) / fill
# slots) ≈ ceil(304 / 42) = 8 rounds at the current registry size
# (306) and window (50 - 2 canaries - 6 watches), so 8 is the
# tightest enforceable bound. build_plan() FAILS LOUDLY if watch/
# canary growth ever starves the LRU fill past it — the failure mode
# that silently orphaned chunk_semantic in r7 can now only manifest
# as a generation error, never as a stale artifact.
MAX_STALENESS_ROUNDS = 8


def _verification_history(before_round: int | None = None) -> dict[str, int]:
    """name -> latest round in which the driver verified it green.

    ``before_round`` bounds the history to rounds strictly below it —
    build_plan(N) must be reproducible from rounds < N even after the
    driver writes CORRECTNESS_rN.json mid-round (otherwise the
    in-sync test would go red the moment the round's own artifact
    lands, before anyone can regenerate)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:  # stray file matching the glob but not the shape
            continue
        rnd = int(m.group(1))
        if before_round is not None and rnd >= before_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            # verified = the CONTENT check passed: err clean, rows
            # matched, and hash_match not False (rows_match alone is
            # only the count — r01/r03 recorded rows_match=True,
            # hash_match=False value-wrong rows, which must stay
            # never-verified or the orphan guard is hollow)
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("hash_match") is not False
            ):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def build_plan(round_no: int) -> dict:
    import __spark_entry__ as entrymod

    reg = entrymod._REGISTRY
    oracled = [n for n, (_f, sql) in reg.items() if sql is not None]
    rows_only = [n for n, (_f, sql) in reg.items() if sql is None]
    latest = _verification_history(before_round=round_no)

    never = sorted(n for n in oracled if n not in latest)
    window: list[str] = list(never)
    for n in CANARIES + WATCHES:
        if n in reg and n not in window:
            window.append(n)
    # LRU fill: least-recently-verified first, name as tiebreak.
    fill = sorted(
        (n for n in oracled if n not in window),
        key=lambda n: (latest.get(n, 0), n),
    )
    for n in fill:
        if len(window) >= WINDOW_SIZE:
            break
        window.append(n)
    if len(window) > WINDOW_SIZE:
        raise SystemExit(
            f"window overflow: {len(window)} names for {WINDOW_SIZE} slots "
            f"({len(never)} never-verified + canaries + watches). "
            f"Trim WATCHES or raise WINDOW_SIZE."
        )
    scheduled_later = sorted(
        (n for n in oracled if n not in window),
        key=lambda n: (latest.get(n, 0), n),
    )
    # Staleness invariant: any oracled entry whose verification would
    # reach MAX_STALENESS_ROUNDS rounds old this round MUST be in the
    # window. (Never-verified entries are already forced first, so
    # only the latest-round check is needed here.) The LRU fill
    # naturally schedules these first; this guard exists so that
    # future growth of WATCHES/CANARIES can never starve it silently.
    overdue = sorted(
        n
        for n in oracled
        if n in latest
        and round_no - latest[n] >= MAX_STALENESS_ROUNDS
        and n not in window
    )
    if overdue:
        raise SystemExit(
            f"staleness bound violated: {len(overdue)} oracled entries "
            f"last verified >= {MAX_STALENESS_ROUNDS} rounds ago are not "
            f"in the round-{round_no} window: {overdue}. Trim WATCHES/"
            f"CANARIES or raise WINDOW_SIZE."
        )
    return {
        "generated_by": "tools/gen_driver_window.py",
        "round": round_no,
        "window_size": WINDOW_SIZE,
        "max_staleness_rounds": MAX_STALENESS_ROUNDS,
        "never_verified": never,
        "canaries": CANARIES,
        "watches": [w for w in WATCHES if w in reg],
        "window": window,
        "scheduled_later": scheduled_later,
        "rows_only": sorted(rows_only),
        "last_verified_round": {n: latest[n] for n in sorted(latest) if n in reg},
    }


def main() -> None:
    round_no = None
    args = sys.argv[1:]
    if args and args[0] == "--round":
        if len(args) < 2:
            raise SystemExit("usage: gen_driver_window.py [--round N]")
        round_no = int(args[1])
    if round_no is None:
        rounds = [
            int(m.group(1))
            for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
            if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
        ]
        round_no = (max(rounds) if rounds else 0) + 1
    plan = build_plan(round_no)
    out = os.path.join(REPO, "driver_window.json")
    with open(out, "w") as f:
        json.dump(plan, f, indent=1, sort_keys=False)
        f.write("\n")
    print(
        f"driver_window.json: round {round_no}, "
        f"{len(plan['never_verified'])} never-verified, "
        f"{len(plan['window'])}/{plan['window_size']} window slots, "
        f"{len(plan['scheduled_later'])} scheduled later, "
        f"{len(plan['rows_only'])} rows-only"
    )


if __name__ == "__main__":
    main()
