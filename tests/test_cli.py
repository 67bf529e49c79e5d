"""CLI surface (python/cocoindex/cli.py parity): app loading, the
APP[:FlowName] specifier grammar, ls/show/setup/update/evaluate/drop
against a real user app file registering a @flow_def flow."""

import io
import json
import os

import pytest

from cocoindex_data_ingestion_spark import cli
from cocoindex_data_ingestion_spark.plans import flow as flowmod

APP_SRC = '''
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.plans.flow import flow_def


@flow_def(name="DemoFlow")
def demo_flow(flow, spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta epsilon")],
        "doc_id long, text string",
    )
    scope = flow.add_source("docs", docs, key_cols=["doc_id"])
    scope.transform("n_chars", F.length("text"))
    scope.collect(
        "doc_stats", {"doc_id": "doc_id", "n_chars": "n_chars"},
    )
    flow.export("doc_stats", "doc_stats", primary_key=["doc_id"])
'''


@pytest.fixture()
def app_file(tmp_path):
    flowmod.clear_registry()
    cli._LOADED_APPS.clear()
    p = tmp_path / "myapp.py"
    p.write_text(APP_SRC)
    yield str(p)
    flowmod.clear_registry()
    cli._LOADED_APPS.clear()


def _run(spark, argv):
    buf = io.StringIO()
    rc = cli.main(argv, spark=spark, out=buf)
    return rc, buf.getvalue()


def test_specifier_grammar():
    assert cli.parse_app_flow_specifier("myapp.py") == ("myapp.py", None)
    assert cli.parse_app_flow_specifier("myapp.py:MyFlow") == (
        "myapp.py", "MyFlow",
    )
    # empty flow part collapses to None (cli.py:46-47)
    assert cli.parse_app_flow_specifier("myapp.py:") == ("myapp.py", None)
    with pytest.raises(SystemExit):
        cli.parse_app_flow_specifier(":MyFlow")
    with pytest.raises(SystemExit):
        cli.parse_app_flow_specifier("myapp.py:not-an-identifier")


def test_ls_setup_update_evaluate_drop(spark, tmp_path, app_file):
    state = str(tmp_path / "state")

    # ls before setup: [?]
    rc, out = _run(spark, ["--state-dir", state, "ls", app_file])
    assert rc == 0 and out.strip() == "[?] DemoFlow"

    # update without setup refuses (reference: setup required)
    with pytest.raises(SystemExit, match="not set up"):
        _run(spark, ["--state-dir", state, "update", f"{app_file}:DemoFlow"])

    # setup, then ls shows [+]
    rc, out = _run(spark, ["--state-dir", state, "setup", app_file])
    assert "doc_stats" in out
    rc, out = _run(spark, ["--state-dir", state, "ls", app_file])
    assert out.strip() == "[+] DemoFlow"

    # show prints the spec
    rc, out = _run(
        spark, ["--state-dir", state, "show", f"{app_file}:DemoFlow"]
    )
    spec = json.loads(out)
    assert spec["name"] == "DemoFlow"
    assert spec["exports"]["doc_stats"]["primary_key"] == ["doc_id"]
    assert any(o.startswith("import") for o in spec["ops"])

    # update merges into the parquet-state target; re-update idempotent
    rc, out = _run(
        spark, ["--state-dir", state, "update", f"{app_file}:DemoFlow"]
    )
    assert '"added": 2' in out and '"total": 2' in out
    rc, out = _run(
        spark, ["--state-dir", state, "update", f"{app_file}:DemoFlow"]
    )
    assert '"added": 0' in out and '"total": 2' in out

    # evaluate dumps WITHOUT touching targets
    ev_dir = str(tmp_path / "evalout")
    rc, out = _run(
        spark,
        ["--state-dir", state, "evaluate", f"{app_file}:DemoFlow",
         "-o", ev_dir],
    )
    dumped = json.load(open(os.path.join(ev_dir, "doc_stats.json")))
    assert {r["doc_id"] for r in dumped} == {1, 2}

    # drop refuses without --force, removes with it
    with pytest.raises(SystemExit, match="--force"):
        _run(spark, ["--state-dir", state, "drop", app_file])
    rc, out = _run(
        spark, ["--state-dir", state, "drop", app_file, "--force"]
    )
    assert "removed" in out
    rc, out = _run(spark, ["--state-dir", state, "ls", app_file])
    assert out.strip() == "[?] DemoFlow"


def test_update_with_auto_setup(spark, tmp_path, app_file):
    state = str(tmp_path / "state2")
    rc, out = _run(
        spark,
        ["--state-dir", state, "update", f"{app_file}:DemoFlow", "--setup"],
    )
    assert rc == 0 and '"total": 2' in out
    assert cli.is_set_up(state, "DemoFlow")


def test_flow_def_registry_conflict(spark, app_file):
    cli.load_user_app(app_file)
    with pytest.raises(flowmod.FlowError, match="already registered"):
        flowmod.flow_def(name="DemoFlow")(lambda fl, s: None)


def test_target_default_name_and_namespace(spark):
    from cocoindex_data_ingestion_spark.plans.flow import (
        Flow, get_app_namespace, get_target_default_name,
        set_app_namespace, split_app_namespace,
    )

    fl = Flow("TextEmbedding")
    try:
        set_app_namespace("")
        assert get_target_default_name(fl, "doc_embeddings") == \
            "TextEmbedding__doc_embeddings"
        set_app_namespace("staging")
        assert get_app_namespace() == "staging"
        assert get_app_namespace(trailing_delimiter=".") == "staging."
        assert get_target_default_name(fl, "doc_embeddings") == \
            "staging__TextEmbedding__doc_embeddings"
        assert split_app_namespace(
            "staging__TextEmbedding__doc_embeddings", "__"
        ) == ("staging", "TextEmbedding__doc_embeddings")
        assert split_app_namespace("plain", "__") == ("", "plain")
        import pytest as _pytest

        from cocoindex_data_ingestion_spark.functions.validation import (
            NamingError,
        )
        with _pytest.raises(NamingError):
            set_app_namespace("not a valid name!")
    finally:
        set_app_namespace("")


LIVE_APP_SRC = '''
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.plans.flow import flow_def
from cocoindex_data_ingestion_spark.sources.localfile import read_local_files

DATA_DIR = "%s"


@flow_def(name="LiveFlow")
def live_flow(flow, spark):
    files = read_local_files(spark, DATA_DIR, binary=False)
    scope = flow.add_source("documents", files, key_cols=["path"])
    scope.collect(
        "documents_index",
        {"filename": "filename", "content": "content_text"},
    )
    flow.export("documents_index", "documents_index",
                primary_key=["filename"])
'''


def test_update_live_picks_up_new_files(spark, tmp_path):
    """update --live: collectors are lazy, so each poll re-reads the
    source — a file added between ticks lands in the target (the
    live_updates example's updater loop)."""
    import threading

    flowmod.clear_registry()
    cli._LOADED_APPS.clear()
    data = tmp_path / "data"
    data.mkdir()
    (data / "one.txt").write_text("first")
    app = tmp_path / "liveapp.py"
    app.write_text(LIVE_APP_SRC % str(data))
    state = str(tmp_path / "state")

    # drop a new file midway through the live loop
    def _add_later():
        import time as _t
        _t.sleep(1.0)
        (data / "two.txt").write_text("second")

    t = threading.Thread(target=_add_later)
    t.start()
    rc, out = _run(
        spark,
        ["--state-dir", state, "update", f"{app}:LiveFlow", "--setup",
         "--live", "--refresh-interval", "0.7", "--max-ticks", "4"],
    )
    t.join()
    assert rc == 0
    assert out.count("update LiveFlow") == 4

    from cocoindex_data_ingestion_spark.sinks import TableSink

    sink = TableSink(
        spark, os.path.join(state, "LiveFlow", "documents_index"),
        key_cols=["filename"],
        schema_ddl="filename string, content string",
    )
    rows = {r["filename"]: r["content"] for r in sink.read().collect()}
    assert rows == {"one.txt": "first", "two.txt": "second"}
    flowmod.clear_registry()
    cli._LOADED_APPS.clear()


def test_ls_without_app_lists_persisted_flows(spark, tmp_path, app_file):
    state = str(tmp_path / "state3")
    _run(spark, ["--state-dir", state, "setup", app_file])
    rc, out = _run(spark, ["--state-dir", state, "ls"])
    assert out.strip() == "[+] DemoFlow"


def test_setup_outcome_drift(spark, tmp_path, app_file):
    state = str(tmp_path / "state4")
    rc, out = _run(spark, ["--state-dir", state, "setup", app_file])
    assert "[created]" in out
    rc, out = _run(spark, ["--state-dir", state, "setup", app_file])
    assert "[unchanged]" in out
