"""Interleaved A/B of the load_table scan-spread guard (r10).

Usage: python tools/r10_spread_ab.py <sf_dir> <reps> <name>...

Mode A = spread guard ON (HEAD: tables._SPREAD_KEYS as committed).
Mode B = guard OFF (keys emptied, table cache cleared).

For each row, reps are interleaved A,B,A,B,... in ONE session so a
host-window drift hits both arms equally (SCALING.md Round-9
protocol). Prints per-row {A: [..], B: [..], minA, minB}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import SMALL_RESULT
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources import tables


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("r10_spread_ab")
    qs = entrymod.queries()
    saved_keys = dict(tables._SPREAD_KEYS)

    def set_mode(on: bool) -> None:
        tables._SPREAD_KEYS.clear()
        if on:
            tables._SPREAD_KEYS.update(saved_keys)
        tables._TABLE_CACHE.clear()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        act = (lambda df: df.collect()) if name in SMALL_RESULT else (
            lambda df: df.count()
        )
        # warm both arms at sf0.001 (codegen, JIT, file footers)
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
