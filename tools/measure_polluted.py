"""Measure queries after session pollution — drift bisection helper.

Usage: python tools/measure_polluted.py <repo_dir> <sf_dir> \
           --pollute a,b,c --measure x,y --reps N

Runs the pollute list once at sf_dir (accumulating whatever session
state they leave: localCheckpoint RDD blocks, temp views, broadcasts,
JIT/GC churn), then times the measure list like bench.py rows
(min-of-reps, count() action). Comparing clean vs polluted sessions
across two worktrees isolates WHERE a suite-context slowdown comes
from (r8 verdict watch item #1).
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    repo, sf_dir = sys.argv[1], sys.argv[2]
    opts = dict(zip(sys.argv[3::2], sys.argv[4::2]))
    pollute = [s for s in opts.get("--pollute", "").split(",") if s]
    measure = opts["--measure"].split(",")
    reps = int(opts.get("--reps", "3"))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from cocoindex_data_ingestion_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    for name in measure:
        qs[name](spark, "/root/testdata/sf0.001").count()
    t0 = time.time()
    for name in pollute:
        qs[name](spark, sf_dir).count()
    pollute_sec = round(time.time() - t0, 3)
    out: dict[str, object] = {"pollute_sec": pollute_sec}
    for name in measure:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"reps": samples, "min": min(samples)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
