"""Interleaved A/B of spread_python_stage at module-bound call sites
(r11, VERDICT directive #5).

Usage: python tools/r11_spread_site_ab.py <sf_dir> <reps> <name>...

Unlike tools/r10_dedupspread_ab.py (which patches the parallel module
— enough for dedup.py's call-time import), chunking/docproc/entities/
extract bind the symbol at import time, so this patches the bound
name in EVERY operator module that imported it. Mode A = spread
active (HEAD), mode B = identity. Reps interleaved A,B,A,B in one
session (SCALING.md variance protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import SMALL_RESULT
from cocoindex_data_ingestion_spark.functions import parallel
from cocoindex_data_ingestion_spark.operators import (
    chunking, docmeta, docproc, entities, extract, indexing, multimodal,
    vector_search,
)
from cocoindex_data_ingestion_spark.session import get_spark

_MODULES = [
    chunking, docmeta, docproc, entities, extract, indexing, multimodal,
    vector_search, parallel,
]
_real = parallel.spread_python_stage
_ident = lambda df, *k, **kw: df  # noqa: E731


def set_mode(on: bool) -> None:
    fn = _real if on else _ident
    for m in _MODULES:
        if hasattr(m, "spread_python_stage"):
            m.spread_python_stage = fn


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("r11_spread_site_ab")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        act = (lambda df: df.collect()) if name in SMALL_RESULT else (
            lambda df: df.count()
        )
        for on in (True, False):
            set_mode(on)
            spark.sparkContext.setJobDescription(f"warm:{name}:{on}")
            act(fn(spark, "/root/testdata/sf0.001"))
        a, b = [], []
        for rep in range(reps):
            for on, sink in ((True, a), (False, b)):
                set_mode(on)
                spark.sparkContext.setJobDescription(
                    f"{name}:{'A' if on else 'B'}:rep{rep}"
                )
                t0 = time.time()
                act(fn(spark, sf_dir))
                sink.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"A_on": a, "B_off": b, "minA": min(a), "minB": min(b)}
        print(json.dumps({name: out[name]}), flush=True)
    set_mode(True)
    print("TOTAL minA=%.2f minB=%.2f" % (
        sum(v["minA"] for v in out.values()),
        sum(v["minB"] for v in out.values()),
    ))


if __name__ == "__main__":
    main()
