"""The user CLI — the reference's ``cocoindex`` command surface
(python/cocoindex/cli.py) on this engine:

    python -m cocoindex_data_ingestion_spark ls [APP[:FlowName]]
    python -m cocoindex_data_ingestion_spark show APP:FlowName
    python -m cocoindex_data_ingestion_spark setup APP[:FlowName]
    python -m cocoindex_data_ingestion_spark update APP[:FlowName] [--setup]
    python -m cocoindex_data_ingestion_spark evaluate APP:FlowName [-o DIR]
    python -m cocoindex_data_ingestion_spark drop APP [FlowName ...] --force

APP is ``path/to/app.py`` or a module name; ``:FlowName`` selects one
flow (cli.py:28-55 ``_parse_app_flow_specifier`` — split on the FIRST
colon, flow part must be an identifier). The app module registers
flows with ``@flow_def(name=...)`` builders taking (flow, spark).

Semantics mirrored from the reference commands:
- ``ls``   — flows in the app + per-flow setup status ([+] set up /
  [?] not set up), cli.py:159-205.
- ``show`` — the flow spec: ops, collectors, exports (cli.py:207+).
- ``setup``— create target state + write the setup manifest,
  idempotent (cli.py:287-306).
- ``update`` — incremental apply: MERGE every export's collector
  rows into its keyed parquet-state target; ``--setup`` sets up
  first; ``--live`` runs the FlowLiveUpdater poll loop (rebuild flow
  → fresh source listings → MERGE, every --refresh-interval seconds,
  bounded by --max-ticks for tests) (cli.py:379-450).
- ``evaluate`` — run transformations WITHOUT updating targets, dump
  per-collector JSON to ``eval_<FlowName>_<ts>`` or ``-o`` dir
  (cli.py:453-496; dump mechanism = plans.dumper).
- ``drop`` — remove target state for the app's flows (cli.py:308-377;
  ``--force`` skips the confirmation, which is mandatory here since
  the CLI is non-interactive).

Argparse (stdlib) replaces click — same grammar, no extra deps.
"""

from __future__ import annotations

import argparse
import importlib
import importlib.util
import json
import os
import shutil
import sys
import time


def parse_app_flow_specifier(specifier: str) -> tuple[str, str | None]:
    """cli.py:28-55, faithfully: split on the FIRST colon; empty flow
    part collapses to None; non-identifier flow part is an error."""
    parts = specifier.split(":", 1)
    app_ref = parts[0]
    if not app_ref:
        raise SystemExit(
            f"Application module/path part is missing or invalid in "
            f"specifier: '{specifier}'. Expected format like 'myapp.py' "
            "or 'myapp:MyFlow'."
        )
    if len(parts) == 1 or not parts[1]:
        return app_ref, None
    flow_ref = parts[1]
    if not flow_ref.isidentifier():
        raise SystemExit(
            f"Invalid format for flow name part ('{flow_ref}') in "
            f"specifier '{specifier}'."
        )
    return app_ref, flow_ref


_LOADED_APPS: set[str] = set()


def load_user_app(app_ref: str) -> None:
    """cli.py ``_load_user_app``: a .py path loads by location, else
    import as a module. Loading registers the app's @flow_def flows.
    Idempotent per path within one process, like Python's module
    cache (re-executing the app would double-register its flows)."""
    if app_ref.endswith(".py") or os.path.sep in app_ref:
        path = os.path.abspath(app_ref)
        if path in _LOADED_APPS:
            return
        if not os.path.isfile(path):
            raise SystemExit(f"app file not found: {app_ref}")
        name = os.path.splitext(os.path.basename(path))[0]
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        _LOADED_APPS.add(path)
    else:
        importlib.import_module(app_ref)


def _state_dir(base: str, flow_name: str, target: str | None = None) -> str:
    d = os.path.join(base, flow_name)
    return os.path.join(d, target) if target else d


def _manifest_path(base: str, flow_name: str) -> str:
    return os.path.join(_state_dir(base, flow_name), "_setup.json")


def is_set_up(base: str, flow_name: str) -> bool:
    return os.path.isfile(_manifest_path(base, flow_name))


def _select_flows(spark, flow_name: str | None):
    from cocoindex_data_ingestion_spark.plans import flow as flowmod

    if flow_name is None:
        return flowmod.all_flows(spark)
    return {flow_name: flowmod.flow_by_name(flow_name, spark)}


def cmd_ls(spark, args, out) -> int:
    from cocoindex_data_ingestion_spark.plans import flow as flowmod

    if args.app_target:
        app_ref, _ = parse_app_flow_specifier(args.app_target)
        load_user_app(app_ref)
        # reference legend: [+] set up, [?] not set up (cli.py:186-205)
        for name in flowmod.flow_names():
            marker = "[+]" if is_set_up(args.state_dir, name) else "[?]"
            print(f"{marker} {name}", file=out)
        return 0
    # no app: list flows persisted in the backend (the reference's
    # ls-without-app reads the setup metadata tables, cli.py:159-185)
    names = sorted(
        d for d in (os.listdir(args.state_dir)
                    if os.path.isdir(args.state_dir) else [])
        if is_set_up(args.state_dir, d)
    )
    for name in names:
        print(f"[+] {name}", file=out)
    return 0


def cmd_show(spark, args, out) -> int:
    app_ref, flow_name = parse_app_flow_specifier(args.app_flow_specifier)
    load_user_app(app_ref)
    if flow_name is None:
        raise SystemExit("show requires APP:FlowName")
    fl = _select_flows(spark, flow_name)[flow_name]
    spec = {
        "name": fl.name,
        "ops": [f"{o.kind}: {o.detail}" for o in fl._ops],
        "collectors": {
            n: df.columns for n, df in fl._collectors.items()
        },
        "exports": fl.exports(),
        "fingerprint": fl.logic_fingerprint(),
    }
    print(json.dumps(spec, indent=1, sort_keys=True), file=out)
    return 0


def _setup_flow(base: str, fl) -> dict:
    """Idempotent setup with drift detection (the reference setup
    computes a spec delta and applies only changes, cli.py:287-306 +
    setup.py): outcome is created / unchanged / updated (flow logic
    fingerprint or export set differs from the stored manifest)."""
    created = []
    for target, meta in fl.exports().items():
        d = _state_dir(base, fl.name, target)
        if not os.path.isdir(d):
            os.makedirs(d, exist_ok=True)
            created.append(target)
    manifest = {
        "flow": fl.name,
        "targets": {
            t: {"primary_key": m["primary_key"]}
            for t, m in fl.exports().items()
        },
        "fingerprint": fl.logic_fingerprint(),
    }
    outcome = "created"
    mp = _manifest_path(base, fl.name)
    if os.path.isfile(mp):
        with open(mp) as f:
            prev = json.load(f)
        outcome = "unchanged" if prev == manifest else "updated"
    os.makedirs(_state_dir(base, fl.name), exist_ok=True)
    with open(mp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return {"created": created, "outcome": outcome}


def cmd_setup(spark, args, out) -> int:
    app_ref, flow_name = parse_app_flow_specifier(args.app_target)
    load_user_app(app_ref)
    for name, fl in _select_flows(spark, flow_name).items():
        r = _setup_flow(args.state_dir, fl)
        print(f"setup {name} [{r['outcome']}]: "
              f"targets={sorted(fl.exports())} "
              f"created={r['created']}", file=out)
    return 0


def _update_once(spark, args, name, fl, out) -> None:
    from cocoindex_data_ingestion_spark.sinks import TableSink

    stats = {}
    for target, meta in fl.exports().items():
        rows = fl.collector(meta["collector"])
        ddl = ", ".join(f"{c} {t}" for c, t in rows.dtypes)
        sink = TableSink(
            spark, _state_dir(args.state_dir, name, target),
            key_cols=meta["primary_key"], schema_ddl=ddl,
        )
        before = sink.read().count()
        sink.merge(rows)
        after = sink.read().count()
        stats[target] = {
            "rows": rows.count(),
            "added": after - before,
            "total": after,
        }
    if not args.quiet:
        print(f"update {name}: " + json.dumps(stats, sort_keys=True),
              file=out)


def cmd_update(spark, args, out) -> int:
    app_ref, flow_name = parse_app_flow_specifier(args.app_flow_specifier)
    load_user_app(app_ref)
    flows = _select_flows(spark, flow_name)
    for name, fl in flows.items():
        if not is_set_up(args.state_dir, name):
            if args.setup:
                _setup_flow(args.state_dir, fl)
            else:
                raise SystemExit(
                    f"flow '{name}' is not set up — run setup first or "
                    "pass --setup"
                )
    if not args.live:
        for name, fl in flows.items():
            _update_once(spark, args, name, fl, out)
        return 0
    # --live: the FlowLiveUpdater poll loop (cli.py:383-389 + the
    # live_updates example). Spark pins a file source's listing at
    # DataFrame creation, so each tick REBUILDS the flow (fresh
    # source listings — the reference updater re-lists per refresh
    # interval) and MERGEs the collectors again. --max-ticks bounds
    # the loop for tests/one-shot sweeps (0 = run until interrupted,
    # the reference's updater.wait()).
    from cocoindex_data_ingestion_spark.plans import flow as flowmod

    tick = 0
    while True:
        for name in list(flows):
            flowmod.invalidate_flow(name)
            fl = flowmod.flow_by_name(name, spark)
            _update_once(spark, args, name, fl, out)
        tick += 1
        if args.max_ticks and tick >= args.max_ticks:
            return 0
        time.sleep(args.refresh_interval)


def cmd_evaluate(spark, args, out) -> int:
    from cocoindex_data_ingestion_spark.plans.dumper import dump_golden

    app_ref, flow_name = parse_app_flow_specifier(args.app_flow_specifier)
    load_user_app(app_ref)
    if flow_name is None:
        raise SystemExit("evaluate requires APP:FlowName")
    fl = _select_flows(spark, flow_name)[flow_name]
    # reference default: eval_<FlowName>_<ts> in the cwd (cli.py:486)
    out_dir = args.output_dir or f"eval_{fl.name}_{int(time.time())}"
    counts = dump_golden(out_dir, dict(fl._collectors))
    print(f"evaluate {fl.name}: wrote {out_dir} "
          + json.dumps(counts, sort_keys=True), file=out)
    return 0


def cmd_drop(spark, args, out) -> int:
    app_ref, _ = parse_app_flow_specifier(args.app_target)
    load_user_app(app_ref)
    from cocoindex_data_ingestion_spark.plans import flow as flowmod

    names = list(args.flow_name) or flowmod.flow_names()
    if not args.force:
        raise SystemExit(
            "drop removes target state; pass --force to confirm "
            "(this CLI is non-interactive)"
        )
    for name in names:
        d = _state_dir(args.state_dir, name)
        existed = os.path.isdir(d)
        shutil.rmtree(d, ignore_errors=True)
        print(f"drop {name}: {'removed' if existed else 'no state'}",
              file=out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cocoindex-spark",
        description="cocoindex-compatible flow CLI on the Spark engine",
    )
    p.add_argument(
        "--state-dir", default=".cocoindex_state",
        help="target-state root (parquet-state MERGE targets)",
    )
    sub = p.add_subparsers(dest="command", required=True)

    ls = sub.add_parser("ls", help="list flows and setup status")
    ls.add_argument("app_target", nargs="?", default=None)

    show = sub.add_parser("show", help="print one flow's spec")
    show.add_argument("app_flow_specifier")

    setup = sub.add_parser("setup", help="set up flow targets")
    setup.add_argument("app_target")
    setup.add_argument("-f", "--force", action="store_true")

    upd = sub.add_parser("update", help="incremental update (one-shot "
                                        "or --live poll loop)")
    upd.add_argument("app_flow_specifier")
    upd.add_argument("--setup", action="store_true",
                     help="set up automatically if needed")
    upd.add_argument("-L", "--live", action="store_true",
                     help="keep polling sources and applying changes")
    upd.add_argument("--refresh-interval", type=float, default=5.0,
                     help="seconds between live polls")
    upd.add_argument("--max-ticks", type=int, default=0,
                     help="stop the live loop after N polls (0 = run "
                          "until interrupted)")
    upd.add_argument("-q", "--quiet", action="store_true")

    ev = sub.add_parser("evaluate",
                        help="run transformations, dump outputs, "
                             "no target update")
    ev.add_argument("app_flow_specifier")
    ev.add_argument("-o", "--output-dir", default=None)

    drop = sub.add_parser("drop", help="remove flows' target state")
    drop.add_argument("app_target")
    drop.add_argument("flow_name", nargs="*")
    drop.add_argument("-f", "--force", action="store_true")
    return p


_COMMANDS = {
    "ls": cmd_ls,
    "show": cmd_show,
    "setup": cmd_setup,
    "update": cmd_update,
    "evaluate": cmd_evaluate,
    "drop": cmd_drop,
}


def main(argv: list[str] | None = None, spark=None, out=None) -> int:
    args = build_parser().parse_args(argv)
    if spark is None:
        from cocoindex_data_ingestion_spark.session import get_spark

        spark = get_spark("cli")
    return _COMMANDS[args.command](spark, args, out or sys.stdout)


if __name__ == "__main__":
    raise SystemExit(main())
