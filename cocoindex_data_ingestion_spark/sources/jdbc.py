"""JDBC / external-service source stubs.

Reference connectors that require external services (SURVEY §2.2):
Postgres/Supabase row sources (app/flows/sources.py:16-61), Google
Drive (google_drive.rs), Notion (notion_connector.py), S3/Azure
blob listings.

In this environment no external services exist; these are thin,
import-guarded builders that produce the SAME DataFrame contract the
rest of the engine consumes, so swapping in a live connection is a
config change, not a code change."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    predicate: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC source (Supabase/Postgres row source analogue).

    ``partition_column`` enables parallel reads (one JDBC cursor per
    partition) — required at scale; a single-cursor read is a driver
    bottleneck."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if predicate:
        reader = reader.option(
            "dbtable", f"(SELECT * FROM {table} WHERE {predicate}) AS t"
        )
    if partition_column:
        reader = reader.option("partitionColumn", partition_column).option(
            "numPartitions", str(num_partitions)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


import re

_SAFE_ID_RE = re.compile(r"^[A-Za-z0-9_-]+$")


def single_document_source(
    spark: SparkSession, url: str, document_id: str, **options: str
) -> DataFrame:
    """Reference SingleDocumentSource (app/flows/sources.py:16-61):
    one document row by id — a predicate-pushdown JDBC read.

    The id is validated against the reference's id shape (UUID/hash
    charset) before interpolation — JDBC's dbtable option has no bind
    parameters, so never splice arbitrary strings into it."""
    if not _SAFE_ID_RE.match(document_id):
        raise ValueError(
            f"document_id {document_id!r} is not a valid id (expected "
            "[A-Za-z0-9_-]+); refusing to build a JDBC predicate from it"
        )
    return read_jdbc_table(
        spark, url, "documents", predicate=f"id = '{document_id}'", **options
    )
