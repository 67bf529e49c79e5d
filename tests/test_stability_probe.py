"""Partition-variance check over EVERY oracled query (tools/
stability_probe.py): each query must produce the identical normalized
row multiset as its DuckDB oracle under several shuffle-partition
settings. Catches float-associativity flakes (the round-1
events_sessionize bug class) the moment a new oracled query is
registered — no manual list to maintain.

Runs at sf0.001 to keep the default suite tolerable; the per-round
driver gate at sf0.01 plus tools/stability_probe.py cover the larger
scale.
"""

import pytest

from tools.stability_probe import run_probe


@pytest.mark.slow
def test_all_oracled_queries_partition_stable():
    flaky = run_probe(
        "/root/testdata/sf0.001", partition_settings=(5, 32), verbose=False
    )
    assert not flaky, f"partition-variance FLAKY queries: {flaky}"
