"""Parallelism guard for JVM→Python stages.

A ``mapInPandas``/``applyInPandas`` stage inherits its input's
partitioning. When the input is a scan of a file smaller than one
split (``spark.sql.files.maxPartitionBytes``) — or a post-shuffle
frame AQE has coalesced to a handful of partitions — the whole
Python stage runs on that many tasks, serializing per-row Python
work that is embarrassingly parallel (guide §2.5 "input skew …
repartition immediately after the read"). A parquet row group is
assigned to one split, so a single-row-group file can never split
no matter how small ``maxPartitionBytes`` is; the only fix is an
explicit exchange.

:func:`spread_python_stage` repartitions by a deterministic key hash
only when the input has fewer partitions than the session's default
parallelism. At scale the condition is false on every corpus-sized
input (a 100 TB scan has thousands of splits), so the guard is a
no-op exactly where the exchange would be expensive, and the
exchange it adds locally moves only the narrow projected columns
once.

The same guard applies to HEAVY JVM expression maps (minhash
signature hashing, winnowing gram hashing): anywhere per-row map
work far exceeds the cost of one bounded exchange of its input.
It is deliberately NOT applied at plain scans or cheap maps — the
blanket at-read variant was A/B-measured as a net loss
(OPTIMIZATION_r10.md, load_table section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


MAX_CHEAP_BYTES = 4 * 1024**3


def spread_python_stage(
    df: DataFrame, *key_cols: str, min_parallelism: int | None = None
) -> DataFrame:
    """Return ``df`` repartitioned by ``key_cols`` to the session's
    default parallelism iff it currently has fewer partitions AND the
    optimizer's size estimate says the added exchange is cheap
    (≤ ``MAX_CHEAP_BYTES``) — an under-partitioned but genuinely
    large frame keeps its layout rather than paying a surprise
    corpus-sized shuffle.

    Keys must be deterministic row attributes (never ``rand()`` —
    retried map tasks would re-draw, SPARK-38388) with many more
    distinct values than partitions so the hash spreads evenly; the
    natural document/vector id satisfies both.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    try:
        est = int(
            str(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        )
    except Exception:
        est = None
    if est is not None and est > MAX_CHEAP_BYTES:
        return df
    return df.repartition(target, *key_cols)
