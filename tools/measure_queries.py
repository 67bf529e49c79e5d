"""Isolated warm re-measurement of individual bench rows.

Usage: python tools/measure_queries.py <repo_dir> <sf_dir> <reps> <name>...

Reproduces the bench.py row methodology (warm session at sf0.001,
then full executions at sf_dir, count() action) for one or a few
named queries in a fresh process, printing every rep so warm-min and
first-run effects are both visible. Used to bisect the r8 bench
drift (r8 verdict watch item #1): run the same names against HEAD
and against a git worktree of an earlier commit by passing that
worktree as <repo_dir>.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    repo, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from cocoindex_data_ingestion_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        fn(spark, "/root/testdata/sf0.001").count()  # session/plan warm
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"reps": samples, "warm_min": min(samples[1:] or samples)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
