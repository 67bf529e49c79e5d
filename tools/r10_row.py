"""Round-10 per-row measure + plan capture.

Usage: python tools/r10_row.py <sf_dir> <reps> <tag> <name>...

For each named query: warms at sf0.001, runs <reps> full executions
at <sf_dir> using the SAME action the bench uses (collect for
SMALL_RESULT rows, count otherwise), prints per-rep seconds + min,
and writes ``plans/r10/<name>_<tag>.txt`` with the
``.explain("formatted")`` output (tag = before|after).

Jobs are labelled (guide §1.5) so a UI/event-log reader can map
stages to rows.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import SMALL_RESULT
from cocoindex_data_ingestion_spark.session import get_spark


def main() -> None:
    sf_dir, reps, tag = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    names = sys.argv[4:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r10")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("r10_row")
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        act = (lambda df: df.collect()) if name in SMALL_RESULT else (
            lambda df: df.count()
        )
        spark.sparkContext.setJobDescription(f"warm:{name}")
        act(fn(spark, "/root/testdata/sf0.001"))
        # plan capture (pre-execution AQE plan, like PLANS.md)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, sf_dir).explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        samples = []
        for rep in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{rep}")
            t0 = time.time()
            act(fn(spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"reps": samples, "min": min(samples)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
