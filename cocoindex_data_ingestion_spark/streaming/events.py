"""Streaming operators over the events stream.

Reference semantics: the engine's "streaming" is per-source change
streams + ordinal-monotonic keyed upsert (last-writer-wins by
ordinal, src/execution/row_indexer.rs:110-131) with ack-after-
processing (live_updater.rs:23-64). It has NO event-time watermarks
or windows — those are Spark-native capabilities this engine adds
for the driver's ``events`` table (SURVEY §2.5 note).

Operators:
- ``read_events_stream``   — file-source stream over the events dir
  (stand-in for Kafka/SQS; same DataFrame downstream).
- ``windowed_counts``      — watermarked tumbling/sliding windows.
- ``session_windows``      — native session_window aggregation.
- ``ordinal_upsert_stream``— the reference-faithful keyed upsert as a
  stateful stream: max-ordinal state per key via
  ``applyInPandasWithState``; out-of-order/stale events dropped.
- ``foreach_batch_upsert`` — exactly-once-style sink: per-batch MERGE
  keyed by (key, ordinal) mirrored on the 2-phase commit
  (row_indexer.rs:140-505); idempotent per batchId.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import ts_us
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream (one micro-batch per file by default —
    maxFilesPerTrigger is the reference's max_inflight backpressure,
    src/base/spec.rs:247-262)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation; late rows
    beyond the watermark are dropped (the late-data policy the
    reference lacks)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("window"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Native session windows per user (gap-close semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("session"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_UPSERT_STATE_SCHEMA = "max_ordinal long"
_UPSERT_OUT_SCHEMA = (
    "user_id long, event_id long, ordinal long, event_type string, value double"
)


def _upsert_fn(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Keep only rows with ordinal strictly newer than the state's
    max (SourceVersion::should_skip, row_indexer.rs:110-131);
    last-writer-wins within the batch.

    The surviving row is the (ordinal, event_id)-argmax of the batch
    — if any row is fresh, the argmax row is fresh too (it carries
    the batch-max ordinal) and it is exactly the row the old
    sort-then-take-last picked. Computing the argmax directly on the
    ordinal/event_id arrays replaces a whole-group sort + boolean
    filter with two vector scans, which matters because this function
    runs once per key per micro-batch (r10, guide §4.2).

    The emitted row is a POSITIONAL slice (r11): the stream projects
    exactly the five output columns in schema order before the
    stateful operator, so ``iloc[win:win+1]`` already matches
    ``_UPSERT_OUT_SCHEMA`` — the old ``iloc[[win]][cols]`` list-index
    + column re-select built two intermediate frames per key call
    (micro-benched 304 µs -> 25 µs per key; this body runs
    |keys| x |batches| times)."""
    (max_ordinal,) = state.get if state.exists else (-1,)
    chunks = list(pdfs)
    rows = chunks[0] if len(chunks) == 1 else pd.concat(
        chunks, ignore_index=True
    )
    o = rows["ordinal"].to_numpy()
    mx = o.max()
    if mx > max_ordinal:
        cand = (o == mx).nonzero()[0]
        if len(cand) > 1:
            e = rows["event_id"].to_numpy()
            win = int(cand[e[cand].argmax()])
        else:
            win = int(cand[0])
        state.update((int(mx),))
        yield rows.iloc[win:win + 1]


def ordinal_upsert_stream(events: DataFrame) -> DataFrame:
    """Stateful ordinal-monotonic upsert: one surviving row per key
    per batch, stale/out-of-order updates dropped.

    State is (key → max ordinal); storage is Spark's state store —
    bounded by key cardinality, partitioned by key hash (scales to
    any key count across executors).

    Only the five output columns cross the JVM→Python boundary
    (guide §4.1): ``ts`` is already folded into ``ordinal`` and the
    ``props`` JSON blob — the widest column of the stream — is never
    used, so shipping it per row was pure Arrow/transpose cost."""
    with_ord = events.withColumn("ordinal", ts_us("ts")).select(
        "user_id", "event_id", "ordinal", "event_type", "value"
    )
    return with_ord.groupBy("user_id").applyInPandasWithState(
        _upsert_fn,
        outputStructType=_UPSERT_OUT_SCHEMA,
        stateStructType=_UPSERT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_upsert(target_state, key_col: str = "user_id"):
    """Exactly-once-style sink builder for ``writeStream.foreachBatch``.

    Each batch MERGEs into the parquet state by key keeping the max
    ordinal (idempotent: re-delivered batches can't regress state —
    the reference's precommit/commit tolerance,
    row_indexer.rs:140-505)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col("ordinal").desc(), F.col("event_id").desc())
        )
        if hasattr(target_state, "read_keys"):
            # BucketedParquetState: read ONLY the batch keys' buckets,
            # resolve max-ordinal per key, rewrite only those buckets —
            # O(batch) I/O per micro-batch instead of O(state)
            cur = target_state.read_keys(batch_df.select(key_col))
            merged = cur.unionByName(batch_df, allowMissingColumns=True)
            latest = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter("_rn = 1")
                .drop("_rn")
            )
            target_state.merge(latest)
        else:
            cur = target_state.read()
            merged = cur.unionByName(batch_df, allowMissingColumns=True)
            latest = (
                merged.withColumn("_rn", F.row_number().over(w))
                .filter("_rn = 1")
                .drop("_rn")
            )
            target_state.overwrite(latest)

    return _sink


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Watermarked stream-stream interval join (attribution shape):
    each left event pairs with the same key's right events from the
    preceding ``lookback`` window (inclusive of the left timestamp).

    Both sides carry watermarks and the join condition bounds the
    right timestamp on BOTH ends relative to the left's — exactly
    what Spark's state cleanup needs to evict buffered rows once the
    watermark passes them. State per executor is bounded by
    arrival-rate x (lookback + watermark), not stream lifetime — the
    property that makes click->purchase attribution viable on an
    unbounded stream. Batch DataFrames run through the identical
    code (the join condition is engine-agnostic), which is how the
    test oracles it.
    """
    r = right
    for c in right.columns:
        r = r.withColumnRenamed(c, f"{right_prefix}{c}")
    if left.isStreaming:
        left = left.withWatermark("ts", watermark)
        r = r.withWatermark(f"{right_prefix}ts", watermark)
    cond = (
        (F.col(key_col) == F.col(f"{right_prefix}{key_col}"))
        & (
            F.col(f"{right_prefix}ts")
            >= F.col("ts") - F.expr(f"INTERVAL {lookback}")
        )
        & (F.col(f"{right_prefix}ts") <= F.col("ts"))
    )
    return left.join(r, cond, "inner")


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication: emit only the first occurrence
    of each key, with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` is the streaming counterpart of
    batch ``dedup.exact_dedup``: at-least-once upstreams (Kafka
    redelivery, S3 re-listing — the reference's SQS change stream can
    redeliver, src/ops/sources/amazon_s3.rs:180-236) become
    effectively-once downstream. State per key is dropped once the
    watermark passes it, so memory is bounded by the key arrival rate
    x watermark horizon, not the stream's lifetime — the property
    that keeps this viable on an unbounded 100 TB/day stream.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def foreach_batch_ivm(view, applied_path: str | None = None):
    """Streaming incremental view maintenance: fold each micro-batch
    as an insert delta into a :class:`..plans.ivm.MaterializedAgg`.

    Unlike the keyed upsert above, IVM deltas are NOT idempotent — a
    re-delivered batch would double-count — so exactly-once comes
    from a batchId fence persisted next to the view state (the
    standard foreachBatch replay contract: Spark re-runs a failed
    batch with the SAME batchId, which the fence turns into a no-op
    after the first successful apply)."""
    import os

    path = applied_path or os.path.join(view.state.path, "_LAST_BATCH")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        try:
            with open(path) as f:
                last = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            last = -1
        if batch_id <= last:
            return
        view.refresh(inserts=batch_df)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, path)

    return _sink


def ordinal_upsert_stream_tws(events: DataFrame) -> DataFrame:
    """Ordinal-monotonic upsert on Spark 4's ``transformWithState``
    operator — the successor to ``applyInPandasWithState`` above
    (same semantics, same state: key → max ordinal), kept as a twin
    because transformWithState is where new state features land
    (TTL, multiple state variables, timers, state data source reads).
    Requires the RocksDB state store provider AND google.protobuf
    (the Python state-server protocol) — absent in this container,
    so the equivalence test importorskips; applyInPandasWithState
    remains the default implementation.

    Equivalence with :func:`ordinal_upsert_stream` is pinned in
    tests/test_streaming.py."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class _OrdinalUpsert(StatefulProcessor):
        def init(self, handle) -> None:
            self._max = handle.getValueState("max_ord", "max_ordinal long")

        def handleInputRows(self, key, rows, timer_values):
            cur = self._max.get()[0] if self._max.exists() else -1
            batch = pd.concat(list(rows), ignore_index=True)
            batch = batch.sort_values(["ordinal", "event_id"])
            fresh = batch[batch["ordinal"] > cur]
            if len(fresh):
                self._max.update((int(fresh["ordinal"].max()),))
                yield fresh.iloc[[-1]][
                    ["user_id", "event_id", "ordinal", "event_type", "value"]
                ]

        def close(self) -> None:
            pass

    with_ord = events.withColumn("ordinal", ts_us("ts"))
    return with_ord.groupBy("user_id").transformWithStateInPandas(
        _OrdinalUpsert(),
        outputStructType=_UPSERT_OUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def foreach_batch_expectations(
    rules_factory,
    good_path: str,
    quarantine_path: str,
    audit_path: str | None = None,
):
    """Streaming data-quality gate for ``writeStream.foreachBatch``:
    each micro-batch is split by the declarative expectation rules
    (operators/expectations.py) — passing rows append to the good
    sink, violating rows (with their per-rule flags) to the
    quarantine sink, and optionally a one-row per-batch audit record
    (batch_id + violation counts) to an audit log.

    ``rules_factory`` is a zero-arg callable returning the rules dict
    (Column expressions can't cross the closure into executors
    pre-built against another DataFrame, so they're constructed per
    batch — negligible: rule construction is driver-side analysis).

    Idempotence note: appends are at-least-once under redelivery (the
    standard parquet-append caveat); wrap the paths in a
    BucketedParquetState / MERGE-capable table for exactly-once, as
    foreach_batch_upsert does. The split itself is one codegen'd
    scan per batch — the audit is conditional aggregates in the same
    pass shape as expectations.summarize.
    """
    from cocoindex_data_ingestion_spark.operators import expectations

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        rules = rules_factory()
        good, bad = expectations.split(batch_df, rules)
        good.write.mode("append").parquet(good_path)
        bad.write.mode("append").parquet(quarantine_path)
        if audit_path is not None:
            audit = expectations.summarize(batch_df, rules).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            )
            audit.write.mode("append").parquet(audit_path)

    return _sink


def foreach_batch_drift(monitor, applied_path: str | None = None):
    """Streaming drift-reference maintenance: fold each micro-batch
    of embedding rows into an
    :class:`..operators.evaluation.IncrementalDriftMonitor`'s
    reference histogram. Between batches the monitor can PSI-score
    any candidate batch against the accumulated reference without
    rescanning the stream's history — the production monitoring
    loop (reference grows online; alerts score against it).

    Histogram deltas are not idempotent (a re-delivered batch would
    double-count its bucket increments), so the same batchId fence
    as :func:`foreach_batch_ivm` provides exactly-once."""
    import os

    path = applied_path or os.path.join(
        monitor.view.state.path, "_LAST_BATCH"
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        try:
            with open(path) as f:
                last = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            last = -1
        if batch_id <= last:
            return
        monitor.refresh(inserts=batch_df)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, path)

    return _sink


def foreach_batch_join_cdc(
    view,
    side: str,
    op_col: str = "_op",
    applied_path: str | None = None,
):
    """Streaming maintenance of a :class:`..plans.ivm.MaterializedJoin`
    from a CDC stream of ONE side: each micro-batch carries rows
    tagged ``op_col`` = ``'insert'`` or ``'delete'`` (a Debezium-style
    changefeed), which the sink splits into the side's signed deltas
    and folds via the delta rule — the joined export view stays fresh
    without ever re-running the join (reference
    app/tasks/document_tasks.py:1587-1737 re-joins on every publish).

    Join deltas are NOT idempotent (a re-delivered batch would
    double-apply its signed counts), so exactly-once comes from the
    same per-side batchId fence as :func:`foreach_batch_ivm`: Spark
    replays a failed batch with the SAME batchId, which the fence
    turns into a no-op after the first successful apply. Two CDC
    streams (one per side) each use their OWN fence file."""
    import os

    if side not in ("a", "b"):
        raise ValueError("foreach_batch_join_cdc: side must be 'a' or 'b'")
    path = applied_path or os.path.join(
        view.view_state.path, f"_LAST_BATCH_{side}"
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        try:
            with open(path) as f:
                last = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            last = -1
        if batch_id <= last:
            return
        ops = F.col(op_col)
        view.refresh(**{
            f"{side}_inserts": batch_df.filter(ops == "insert").drop(op_col),
            f"{side}_deletes": batch_df.filter(ops == "delete").drop(op_col),
        })
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, path)

    return _sink


# -- SSE change-event stream, true streaming form (app/api/sse.py:81-162) ------

_SSE_OUT_SCHEMA = "doc_id long, seq long, status string, event_type string"
_SSE_STATE_SCHEMA = "last_status string"

_SSE_POLL_SCHEMA = "doc_id long, seq long, to_state string"


def _sse_fn(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """last_states change detection (sse.py:118-146) per document
    key: state carries the last OBSERVED status ACROSS batches, so a
    poll landing in a later micro-batch that repeats the stored
    status emits nothing — exactly the generator's dedup."""
    from ..operators.state_machine import (
        SSE_DEFAULT_EVENT, SSE_EVENT_TYPES,
    )

    (last,) = state.get if state.exists else (None,)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("seq")
    out = []
    for _, r in rows.iterrows():
        st = r["to_state"]
        if st != last:
            out.append(
                (
                    int(key[0]),
                    int(r["seq"]),
                    st,
                    SSE_EVENT_TYPES.get(st, SSE_DEFAULT_EVENT),
                )
            )
            last = st
    state.update((last,))
    if out:
        yield pd.DataFrame(
            out, columns=["doc_id", "seq", "status", "event_type"]
        )


def sse_change_stream(polls: DataFrame) -> DataFrame:
    """The SSE generator as a stateful stream over poll snapshots
    (doc_id, seq, to_state): one emitted event per observed state
    change, duplicates suppressed ACROSS micro-batches through the
    state store (state = last status per document — bounded by
    document cardinality, hash-partitioned across executors). The
    batch twin is state_machine.sse_events_from_polls; equality on a
    shared poll set is the parity contract (test_streaming)."""
    return polls.groupBy("doc_id").applyInPandasWithState(
        _sse_fn,
        outputStructType=_SSE_OUT_SCHEMA,
        stateStructType=_SSE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_poll_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream of state-poll snapshots (stand-in for the
    DB poll loop the reference runs every 2 s)."""
    return (
        spark.readStream.schema(_SSE_POLL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
