"""Interleaved r9-vs-r10 ordinal-upsert replay (r11, VERDICT #1).

Usage: python tools/r11_upsert_replay_ab.py <sf_dir> <reps>

Settles the driver's 12.4 s (r9) -> 16.6 s (r10) question in ONE
session/window. Mode A reconstructs the exact r9 shape (git
c7d77ed): whole-group sort+filter _upsert_fn, ALL columns incl. the
wide props blob shipped to Python, RocksDB changelog checkpointing
OFF. Mode B is HEAD (argmax fn, 5-column projection, changelog ON —
the session default since r10). Fresh checkpoint per rep; noop sink;
10-file availableNow replay — bench_streaming's exact methodology.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from typing import Iterator, Tuple

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cocoindex_data_ingestion_spark.streaming.events as se
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cocoindex_data_ingestion_spark.functions.timeutil import ts_us
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table

_CHANGELOG = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"


def _upsert_fn_r9(
    key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (max_ordinal,) = state.get if state.exists else (-1,)
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ordinal", "event_id"])
    fresh = rows[rows["ordinal"] > max_ordinal]
    if len(fresh):
        last = fresh.iloc[[-1]]
        state.update((int(fresh["ordinal"].max()),))
        yield last[["user_id", "event_id", "ordinal", "event_type", "value"]]


def ordinal_upsert_stream_r9(events):
    with_ord = events.withColumn("ordinal", ts_us("ts"))  # props kept
    return with_ord.groupBy("user_id").applyInPandasWithState(
        _upsert_fn_r9,
        outputStructType=se._UPSERT_OUT_SCHEMA,
        stateStructType=se._UPSERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    spark = get_spark("r11_upsert_replay_ab")
    tmp = tempfile.mkdtemp(prefix="r11_upsert_ab_")
    src = os.path.join(tmp, "src")
    base = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    base.repartition(10).write.parquet(src)

    def stream():
        return se.read_events_stream(spark, src, max_files_per_trigger=1)

    def run(tag: str, build, changelog: bool) -> float:
        saved = spark.conf.get(_CHANGELOG, None)
        spark.conf.set(_CHANGELOG, "true" if changelog else "false")
        try:
            ck = os.path.join(tmp, f"ckpt_{tag}")
            t0 = time.time()
            q = (
                build(stream())
                .writeStream.outputMode("append").format("noop")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(600)
            return round(time.time() - t0, 3)
        finally:
            if saved is None:
                spark.conf.unset(_CHANGELOG)
            else:
                spark.conf.set(_CHANGELOG, saved)

    a, b = [], []
    for rep in range(reps):
        a.append(run(f"A_r9_{rep}", ordinal_upsert_stream_r9, False))
        b.append(run(f"B_head_{rep}", se.ordinal_upsert_stream, True))
        print(f"rep{rep}: r9={a[-1]} head={b[-1]}", flush=True)
    print(json.dumps(
        {"r9": a, "head": b, "minR9": min(a), "minHead": min(b)}
    ))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
