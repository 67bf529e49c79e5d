"""Run ONE streaming bench op in a fresh process, N reps.

Usage: python tools/r10_stream_one.py <sf_dir> <op> <reps> [key=value ...]

op in {upsert, ivm, join}. Prints per-rep wall seconds. Mirrors
bench.bench_streaming's setup (10-file split, availableNow,
maxFilesPerTrigger=1, noop sink) so numbers are comparable, but
without the other ops' streams having run first in the same JVM —
the isolation probe for cumulative state-store/provider effects.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cocoindex_data_ingestion_spark.streaming.events as se
from cocoindex_data_ingestion_spark.plans.ivm import MaterializedAgg
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table


def main() -> None:
    sf_dir, op, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    extra = dict(kv.split("=", 1) for kv in sys.argv[4:])
    spark = get_spark("r10_stream_one", extra_conf=extra or None)
    tmp = tempfile.mkdtemp(prefix="r10_stream_one_")
    src = os.path.join(tmp, "src")
    base = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    base.repartition(10).write.parquet(src)

    def stream():
        return se.read_events_stream(spark, src, max_files_per_trigger=1)

    walls = []
    for rep in range(reps):
        ck = os.path.join(tmp, f"ckpt_{rep}")
        t0 = time.time()
        if op == "upsert":
            q = (
                se.ordinal_upsert_stream(stream())
                .writeStream.outputMode("append").format("noop")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
        elif op == "ivm":
            view = MaterializedAgg(
                spark, os.path.join(tmp, f"ivm_state_{rep}"),
                group_col="event_type", sum_cols=("value",), n_buckets=8,
            )
            q = (
                stream().writeStream
                .foreachBatch(se.foreach_batch_ivm(view))
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
        elif op == "join":
            purchases = stream().filter("event_type = 'purchase'").select(
                "user_id", "ts", "event_id"
            )
            clicks = stream().filter("event_type = 'click'").select(
                "user_id", "ts", "event_id"
            )
            q = (
                se.interval_join(purchases, clicks, lookback="30 minutes")
                .select("event_id", "r_event_id")
                .writeStream.outputMode("append").format("noop")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
        else:
            raise SystemExit(f"unknown op {op}")
        q.awaitTermination(600)
        walls.append(round(time.time() - t0, 3))
        print(f"rep{rep}: {walls[-1]}", flush=True)
    print(json.dumps({"op": op, "extra_conf": extra, "walls": walls}))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
