"""Incremental execution: ordinal / content-hash skip + memoization +
exactly-once-style export.

Reference semantics reproduced (SURVEY §2.5):

- **Ordinal skip** (src/execution/row_indexer.rs:34-131): each source
  row carries a monotonic ordinal (mtime µs). A row is reprocessed
  only if its ordinal is newer than the tracked one, or equal with a
  changed logic fingerprint.
- **Content-hash short-circuit** (row_indexer.rs:506-587): if the
  source content hash is unchanged and the logic fingerprint is
  current, only the tracking ordinal is bumped — no recompute, no
  target writes.
- **Logic fingerprint** (analyzer.rs:1105-1108): flow-definition hash
  stored per row; change ⇒ full reprocess.
- **Deletion detection** (source_indexer.rs:298-393): keys present in
  tracking state but absent from a fresh listing ⇒ target delete.
- **Function memoization** (memoization.rs:17-233): expensive
  function results cached by (behavior_version, args-hash) and
  reused across reprocessing.

Spark-first shape: all of this is *set arithmetic over DataFrames* —
the skip decision is one full-outer join between the source listing
and the tracking table; the memo cache is a left join before the
expensive UDF and a union-back after. State lives in parquet
directories (at production scale: Delta/Iceberg tables so MERGE and
txn log replace the read-modify-write used here; the join logic is
identical).

Decision matrix (ported from the reference's row_indexer tests,
src/execution/row_indexer.rs:823-987 — see tests/test_incremental.py):

| listing vs tracking                | action       |
|------------------------------------|--------------|
| new key                            | process      |
| ordinal newer, content differs     | process      |
| ordinal newer, content same        | bump ordinal |
| ordinal equal, logic same          | skip         |
| ordinal equal, logic changed       | process      |
| ordinal older                      | skip (stale) |
| key gone from listing              | delete       |
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRACKING_COLS = ("_key", "_ordinal", "_content_hash", "_logic_fp", "_process_ordinal")


def content_hash(*cols) -> F.Column:
    """sha256 fingerprint of the row content (row_indexer.rs:506)."""
    return F.sha2(F.to_json(F.struct(*[F.col(c) for c in cols])), 256)


class ParquetState:
    """Tiny parquet-backed state table (tracking / memo / target).

    Read-modify-write with an atomic directory swap; a Delta MERGE
    replaces this verbatim on a real deployment."""

    def __init__(self, spark: SparkSession, path: str, schema_ddl: str):
        self.spark = spark
        self.path = path
        self.schema_ddl = schema_ddl

    def read(self) -> DataFrame:
        if os.path.exists(self.path):
            return self.spark.read.parquet(self.path)
        return self.spark.createDataFrame([], self.schema_ddl)

    def overwrite(self, df: DataFrame) -> None:
        tmp = self.path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        old = self.path + ".old"
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)


class IncrementalRunner:
    """Drives one source → transform → target pipeline incrementally."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        logic_fingerprint: str,
        key_col: str = "key",
        ordinal_col: str = "ordinal",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.logic_fp = logic_fingerprint
        self.key_col = key_col
        self.ordinal_col = ordinal_col
        os.makedirs(state_dir, exist_ok=True)
        self.tracking = ParquetState(
            spark,
            os.path.join(state_dir, "tracking"),
            "_key string, _ordinal long, _content_hash string, "
            "_logic_fp string, _process_ordinal long",
        )

    # -- skip/process/delete decision (one full-outer join) ---------------

    def plan(self, listing: DataFrame, content_cols: list[str]) -> DataFrame:
        """Annotate the listing with the action per key.

        ``listing``: current source rows with key + ordinal + content
        columns. Returns listing columns + ``_action`` in
        {process, bump, skip, delete} (delete rows carry only _key).
        """
        src = listing.withColumn(
            "_key", F.col(self.key_col).cast("string")
        ).withColumn("_src_hash", content_hash(*content_cols))
        trk = self.tracking.read()

        j = src.alias("s").join(trk.alias("t"), "_key", "full_outer")
        ordc = F.col(f"s.{self.ordinal_col}")
        action = (
            F.when(F.col("s._src_hash").isNull(), F.lit("delete"))
            .when(F.col("t._ordinal").isNull(), F.lit("process"))
            .when(
                ordc > F.col("t._ordinal"),
                F.when(
                    (F.col("s._src_hash") == F.col("t._content_hash"))
                    & (F.col("t._logic_fp") == F.lit(self.logic_fp)),
                    F.lit("bump"),
                ).otherwise(F.lit("process")),
            )
            .when(
                ordc == F.col("t._ordinal"),
                F.when(
                    F.col("t._logic_fp") == F.lit(self.logic_fp), F.lit("skip")
                ).otherwise(F.lit("process")),
            )
            .otherwise(F.lit("skip"))  # stale ordinal: last-writer-wins
        )
        src_cols = [c for c in src.columns if c != "_key"]
        return j.select(
            *[F.col(f"s.{c}").alias(c) for c in src_cols],
            F.col("_key"),
            action.alias("_action"),
        )

    # -- one incremental update run ---------------------------------------

    def update(
        self,
        listing: DataFrame,
        content_cols: list[str],
        transform: Callable[[DataFrame], DataFrame],
        target: ParquetState,
        target_key: str = "_key",
    ) -> dict[str, int]:
        """Process changed rows, bump unchanged, delete gone keys.

        The expensive ``transform`` runs ONLY over action=process
        rows. Returns counters (like the reference's stats report,
        live_updater.rs REPORT_INTERVAL)."""
        planned = self.plan(listing, content_cols)
        planned = planned.persist()
        try:
            counts = {
                r["_action"]: r["count"]
                for r in planned.groupBy("_action").count().collect()
            }
            to_process = planned.filter("_action = 'process'").drop("_action")
            to_bump = planned.filter("_action = 'bump'").drop("_action")
            deletes = planned.filter("_action = 'delete'").select("_key")

            # 1. run the transform over changed rows only
            new_rows = transform(to_process.drop("_key", "_src_hash"))

            # 2. target MERGE: delete gone keys + upsert new results
            cur = target.read()
            changed_keys = planned.filter(
                "_action in ('process','delete')"
            ).select(F.col("_key").alias("_changed_key"))
            survivors = cur.join(
                changed_keys,
                cur[target_key] == F.col("_changed_key"),
                "left_anti",
            )
            target.overwrite(
                survivors.unionByName(new_rows, allowMissingColumns=True)
            )

            # 3. tracking MERGE (the reference's 2-phase commit collapses
            #    to one atomic state swap here)
            proc_ord = F.lit(self._next_process_ordinal())
            new_trk = (
                to_process.select(
                    "_key",
                    F.col(self.ordinal_col).alias("_ordinal"),
                    F.col("_src_hash").alias("_content_hash"),
                )
                .withColumn("_logic_fp", F.lit(self.logic_fp))
                .withColumn("_process_ordinal", proc_ord)
            )
            bump_trk = to_bump.select(
                "_key",
                F.col(self.ordinal_col).alias("_ordinal"),
                F.col("_src_hash").alias("_content_hash"),
            ).withColumn("_logic_fp", F.lit(self.logic_fp)).withColumn(
                "_process_ordinal", proc_ord
            )
            old_trk = self.tracking.read()
            keep = old_trk.join(
                planned.filter("_action in ('process','bump','delete')").select(
                    "_key"
                ),
                "_key",
                "left_anti",
            )
            self.tracking.overwrite(keep.unionByName(new_trk).unionByName(bump_trk))
            return {
                "processed": counts.get("process", 0),
                "bumped": counts.get("bump", 0),
                "skipped": counts.get("skip", 0),
                "deleted": counts.get("delete", 0),
            }
        finally:
            planned.unpersist()

    def _next_process_ordinal(self) -> int:
        trk = self.tracking.read()
        row = trk.agg(F.max("_process_ordinal").alias("m")).collect()[0]
        return (row["m"] or 0) + 1


class MemoCache:
    """Function-result memoization (memoization.rs:17-233).

    Wraps an expensive DataFrame-transform (LLM/embedding UDF): cache
    hit rows skip the UDF entirely; misses run it and are written
    back. Keyed by (behavior_version, args-hash) like the reference's
    per-function cache with behavior_version invalidation
    (interface.rs:178-186)."""

    def __init__(
        self, spark: SparkSession, path: str, value_schema_ddl: str,
        behavior_version: int = 1,
    ):
        self.state = ParquetState(
            spark, path, f"_memo_key string, {value_schema_ddl}"
        )
        self.behavior_version = behavior_version

    def memo_key(self, *arg_cols) -> F.Column:
        return F.sha2(
            F.concat_ws(
                "\x00",
                F.lit(str(self.behavior_version)),
                *[F.col(c).cast("string") for c in arg_cols],
            ),
            256,
        )

    def through(
        self,
        df: DataFrame,
        arg_cols: list[str],
        fn: Callable[[DataFrame], DataFrame],
        value_cols: list[str],
    ) -> DataFrame:
        """df + memo → (hits ∪ fn(misses)); cache updated with misses."""
        keyed = df.withColumn("_memo_key", self.memo_key(*arg_cols))
        cache = self.state.read()
        hits = keyed.join(cache, "_memo_key")
        misses = keyed.join(cache.select("_memo_key"), "_memo_key", "left_anti")
        computed = fn(misses)
        # materialize BEFORE the cache swap: the lazy plan references
        # the current cache files, which overwrite() replaces
        result = hits.unionByName(computed.select(*hits.columns)).localCheckpoint(
            eager=True
        )
        self.state.overwrite(
            cache.unionByName(
                computed.select("_memo_key", *value_cols), allowMissingColumns=False
            ).dropDuplicates(["_memo_key"])
        )
        return result.drop("_memo_key")
