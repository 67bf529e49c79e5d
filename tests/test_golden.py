"""Cross-session golden regression: current flagship-flow output must
byte-match the committed goldens/ (evaluate_and_dump mechanism)."""

import os

from cocoindex_data_ingestion_spark.plans.dumper import compare_golden, dump_golden

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens"
)


def test_flagship_goldens_match(spark, tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(GOLDEN_DIR))
    from tools.golden_dump import build_collectors

    out = str(tmp_path / "candidate")
    dump_golden(out, build_collectors(spark))
    assert compare_golden(out, GOLDEN_DIR) == []
