"""Round-6 tests: ANN-defaults floor invariant, LPA cache scoping,
and the round-6 operators (small-to-big retrieval, fused hybrid,
hierarchical MMR)."""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# -- ANN probe defaults: never below the hardcoded production floor ----------


def test_ann_defaults_respect_production_floor():
    """r5 advisor finding: ann_defaults.json shipped ivf_nprobe=2
    (below the production value 3) and both query and oracle read it,
    making the recall shave gate-invisible. The file must never hold
    a value below __spark_entry__._ANN_FALLBACKS, and the loader must
    clamp even if it does."""
    import __spark_entry__ as entrymod

    with open(os.path.join(REPO, "tools", "ann_defaults.json")) as f:
        shipped = json.load(f)
    for knob, floor in entrymod._ANN_FALLBACKS.items():
        assert shipped.get(knob, floor) >= floor, (
            f"ann_defaults.json {knob}={shipped.get(knob)} < floor {floor}"
        )
        # loader-level clamp: even a sub-floor file value is raised
        assert entrymod._ann_tuned(knob) >= floor


def test_ann_tuned_clamps_subfloor_file_value(tmp_path, monkeypatch):
    import __spark_entry__ as entrymod

    # point the loader at a doctored file holding a sub-floor value
    bad = {"ivf_nprobe": 1}
    tools = tmp_path / "tools"
    tools.mkdir()
    (tools / "ann_defaults.json").write_text(json.dumps(bad))
    real_join = os.path.join

    def fake_join(*parts):
        if parts[-1] == "ann_defaults.json":
            return str(tools / "ann_defaults.json")
        return real_join(*parts)

    monkeypatch.setattr(os.path, "join", fake_join)
    assert entrymod._ann_tuned("ivf_nprobe") == \
        entrymod._ANN_FALLBACKS["ivf_nprobe"]


def test_tune_floors_at_hardcoded_fallbacks():
    """The tuner's recommendation floor must come from the hardcoded
    constants, not the (possibly already-lowered) module values —
    otherwise the never-shave invariant can only ratchet downward."""
    import inspect

    from tools import ann_recall

    sig = inspect.signature(ann_recall.tune)
    assert "floors" in sig.parameters
    src = inspect.getsource(ann_recall.main)
    assert "_ANN_FALLBACKS" in src


def test_ann_recall_cli_parses_fixture_flag():
    """`--tune --fixture clustered` must not swallow 'clustered' as
    the sf_dir positional (r5 advisor finding)."""
    import argparse

    from tools import ann_recall  # noqa: F401  (import side effects none)

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("n_queries", nargs="?", type=int, default=16)
    ap.add_argument("--tune", action="store_true")
    ap.add_argument("--write-defaults", action="store_true")
    ap.add_argument("--fixture", choices=["driver", "clustered"],
                    default="driver")
    ns = ap.parse_args(["--tune", "--fixture", "clustered"])
    assert ns.fixture == "clustered"
    assert ns.sf_dir == "/root/testdata/sf0.01"


# -- LPA cache is scoped to the SparkContext ---------------------------------


def test_lpa_cache_keyed_by_application_id(spark):
    import __spark_entry__ as entrymod

    entrymod._LPA_CACHE.clear()
    sf_dir = "/root/testdata/sf0.001"
    entrymod._ensure_lpa(spark, sf_dir)
    (key,) = entrymod._LPA_CACHE.keys()
    assert key == (spark.sparkContext.applicationId, sf_dir)
