"""Golden-output dump harness.

Reference: ``Flow.evaluate_and_dump`` / ``cocoindex evaluate`` runs
the whole flow WITHOUT writing targets and dumps per-source-row
files of all computed fields + collected rows
(src/execution/dumper.rs:19-220, python/cocoindex/flow.py:655-765) —
the engine's intended golden/e2e mechanism.

Spark form: evaluate the flow's collectors and write one JSON file
per source-row key (plus a manifest). JSON, sorted keys, stable
field order → byte-stable across runs, diffable in CI.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame


def _jsonable(v: Any) -> Any:
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if hasattr(v, "asDict"):
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    return v


def dump_golden(
    out_dir: str,
    collectors: dict[str, DataFrame],
    group_key: str | None = None,
) -> dict[str, int]:
    """Write each collector to ``out_dir/<collector>.json`` (or one
    file per group_key value when given). Returns row counts.

    Deterministic: rows sorted by their JSON encoding, keys sorted.
    """
    os.makedirs(out_dir, exist_ok=True)
    counts: dict[str, int] = {}
    for name, df in collectors.items():
        rows = [
            {k: _jsonable(v) for k, v in r.asDict(recursive=True).items()}
            for r in df.collect()
        ]
        rows.sort(key=lambda r: json.dumps(r, sort_keys=True, default=str))
        counts[name] = len(rows)
        if group_key is None:
            path = os.path.join(out_dir, f"{name}.json")
            with open(path, "w") as f:
                json.dump(rows, f, indent=1, sort_keys=True, default=str)
        else:
            groups: dict[str, list] = {}
            for r in rows:
                groups.setdefault(str(r.get(group_key, "_")), []).append(r)
            cdir = os.path.join(out_dir, name)
            os.makedirs(cdir, exist_ok=True)
            for gk, grows in groups.items():
                with open(os.path.join(cdir, f"{gk}.json"), "w") as f:
                    json.dump(grows, f, indent=1, sort_keys=True, default=str)
    manifest = {"collectors": counts}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return counts


def compare_golden(out_dir: str, baseline_dir: str) -> list[str]:
    """Diff two golden dumps; returns list of differing files."""
    diffs = []
    for root, _dirs, files in os.walk(baseline_dir):
        for fn in files:
            base = os.path.join(root, fn)
            rel = os.path.relpath(base, baseline_dir)
            cand = os.path.join(out_dir, rel)
            if not os.path.exists(cand):
                diffs.append(f"missing: {rel}")
                continue
            with open(base) as f1, open(cand) as f2:
                if f1.read() != f2.read():
                    diffs.append(f"differs: {rel}")
    return diffs
