"""Per-batch breakdown of one streaming bench op (guide §1).

Usage: python tools/r10_stream_profile.py <sf_dir> <op> [key=value ...]

Mirrors tools/r10_stream_one.py's replay (10-file split,
availableNow, maxFilesPerTrigger=1, noop sink) and prints, per
micro-batch: numInputRows, durationMs components, and the summed
state-operator metrics (commit/update/removal times, state rows).
One rep — this is a profiler, not a timer.
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
    sf_dir, op = sys.argv[1], sys.argv[2]
    extra = dict(kv.split("=", 1) for kv in sys.argv[3:])
    spark = get_spark("r10_stream_profile", extra_conf=extra or None)
    tmp = tempfile.mkdtemp(prefix="r10_sprof_")
    src = os.path.join(tmp, "src")
    base = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    base.repartition(10).write.parquet(src)

    def stream():
        return se.read_events_stream(spark, src, max_files_per_trigger=1)

    ck = os.path.join(tmp, "ckpt")
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
            spark, os.path.join(tmp, "ivm_state"),
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
    wall = time.time() - t0

    tot = {}
    for p in q.recentProgress:
        dur = p["durationMs"]
        so = p.get("stateOperators") or []
        row = {
            "batchId": p["batchId"],
            "inRows": p["numInputRows"],
            "trigger": dur.get("triggerExecution"),
            "addBatch": dur.get("addBatch"),
            "getBatch": dur.get("getBatch"),
            "latestOffset": dur.get("latestOffset"),
            "queryPlanning": dur.get("queryPlanning"),
            "walCommit": dur.get("walCommit"),
            "commitOffsets": dur.get("commitOffsets"),
            "commitMs": sum(s["commitTimeMs"] for s in so),
            "updMs": sum(s["allUpdatesTimeMs"] for s in so),
            "rmMs": sum(s["allRemovalsTimeMs"] for s in so),
            "stateRows": sum(s["numRowsTotal"] for s in so),
        }
        print(json.dumps(row), flush=True)
        for k in ("trigger", "addBatch", "getBatch", "latestOffset",
                  "queryPlanning", "walCommit", "commitOffsets",
                  "commitMs", "updMs", "rmMs"):
            tot[k] = tot.get(k, 0) + (row[k] or 0)
        tot["batches"] = tot.get("batches", 0) + 1
    tot["wall_sec"] = round(wall, 2)
    print("TOTALS " + json.dumps(tot))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
