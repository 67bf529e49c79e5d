"""Poll-for-changes source adapter (GoogleDrive / Notion shape).

Reference behavior: Google Drive polls ``files.list`` ordered by
modified time and diffs against known state
(src/ops/sources/google_drive.rs — change polling with
``recent_updates``); the Notion connector does incremental sync on
``last_edited_time`` (app/connectors/notion_connector.py). Both
reduce to: LIST (key, ordinal, content) → ordinal skip matrix →
process/bump/skip/delete.

Here the "remote" is a local fixture directory (no cloud creds in
this environment) — the change-capture logic is the real thing and is
exactly what the reference exercises; a live connector only swaps the
``list_snapshot`` implementation (REST list instead of file list).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.plans.incremental import (
    BucketedParquetState, IncrementalRunner,
)
from cocoindex_data_ingestion_spark.sources.localfile import read_local_files


class PollingSource:
    """Poll a directory-shaped source; each ``poll`` diffs the fresh
    listing against tracked state (ordinal = mtime µs) and processes
    only changes — the reference's change-capture path."""

    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        state_dir: str,
        logic_fingerprint: str = "polling-v1",
        include_glob: str | None = None,
    ):
        self.spark = spark
        self.source_dir = source_dir
        self.include_glob = include_glob
        self.runner = IncrementalRunner(
            spark, state_dir, logic_fingerprint,
            key_col="path", ordinal_col="ordinal",
        )

    def list_snapshot(self) -> DataFrame:
        """One poll's listing: (path, filename, content_text, ordinal)."""
        return read_local_files(
            self.spark, self.source_dir,
            include_glob=self.include_glob, binary=False,
        )

    def poll(
        self,
        transform: Callable[[DataFrame], DataFrame],
        target: BucketedParquetState,
    ) -> dict[str, int]:
        """Diff + process: returns {processed, bumped, skipped,
        deleted} counters like the reference's stats report."""
        return self.runner.update(
            self.list_snapshot(), ["content_text"], transform, target
        )
