"""A/B the streaming bench surface under extra session confs.

Usage: python tools/r10_stream_ab.py <sf_dir> [key=value ...]

Runs bench.bench_streaming in THIS process with get_spark(extra_conf=
{...}) and prints the results dict as JSON — run once with no extra
confs (control) and once per candidate conf set, each in a fresh
process so JVM/session state can't leak between arms.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_streaming
from cocoindex_data_ingestion_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    extra = dict(kv.split("=", 1) for kv in sys.argv[2:])
    spark = get_spark("r10_stream_ab", extra_conf=extra or None)
    out = bench_streaming(spark, sf_dir)
    print(json.dumps({"extra_conf": extra, "results": out}))


if __name__ == "__main__":
    main()
