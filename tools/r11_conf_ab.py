"""Interleaved A/B of a runtime SQL conf across named queries (r11).

Usage: python tools/r11_conf_ab.py <sf_dir> <reps> <key=value> <name>...

Mode A = session default, mode B = the given conf set via
spark.conf.set (planning-time confs re-read per query). Reps
interleaved A,B,A,B in one session (SCALING.md variance protocol).
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


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    key, value = sys.argv[3].split("=", 1)
    names = sys.argv[4:]
    spark = get_spark("r11_conf_ab")
    default = spark.conf.get(key, None)

    def set_mode(on: bool) -> None:
        if on:
            if default is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, default)
        else:
            spark.conf.set(key, value)

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
        out[name] = {"A_default": a, "B_conf": b, "minA": min(a),
                     "minB": min(b)}
        print(json.dumps({name: out[name]}), flush=True)
    set_mode(True)
    print("TOTAL minA=%.2f minB=%.2f" % (
        sum(v["minA"] for v in out.values()),
        sum(v["minB"] for v in out.values()),
    ))


if __name__ == "__main__":
    main()
