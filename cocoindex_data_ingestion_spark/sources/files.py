"""Structured-file sources: CSV / JSON-Lines readers on the same
row-source contract as LocalFile (key, ordinal, content columns).

Reference scope: the reference ingests structured exports through its
connectors (Notion blocks, Drive sheets, Supabase rows) and leaves
file parsing to LlamaParse hooks; a Spark-native engine gets
CSV/JSONL for free from the DataSource API, so these wrappers add the
parts the reference's source contract cares about:

- **ordinal**: file modification time (µs) joined onto every row via
  ``_metadata.file_modification_time`` — the same mtime ordinal
  LocalFile uses, so the incremental runner's skip logic applies
  unchanged to structured rows.
- **corrupt-record quarantine**: PERMISSIVE parsing with the rescued
  ``_corrupt_record`` column split into a separate quarantine
  DataFrame instead of silently dropping (DROPMALFORMED) or failing
  the batch (FAILFAST) — at 100 TB a single bad row must not kill an
  ingest, and silent drops are unauditable.

Schema is caller-provided (schema-on-read): inference would scan the
data twice and produce drifting types across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _with_ordinal(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "ordinal", F.unix_micros(F.col("_metadata.file_modification_time"))
    ).withColumn("source_path", F.col("_metadata.file_path"))


def _split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    # Spark refuses to answer queries that reference ONLY the rescue
    # column of a raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    # the documented contract is to materialize the parsed batch
    # first. An ingest processes one micro-batch/file-listing slice at
    # a time, so the cache is batch-sized, not corpus-sized.
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        "source_path", "ordinal", CORRUPT_COL
    )
    return good, bad


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines rows with mtime ordinal; returns (rows, quarantine).

    The declared schema gets the rescue column appended; malformed
    lines land whole in the quarantine frame with their source path
    and ordinal, so a re-ingest after a fix is a pushed-down
    ``source_path`` predicate away.
    """
    df = (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .select("*", "_metadata")
    )
    return _split_quarantine(_with_ordinal(df).drop("_metadata"))


def read_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
    delimiter: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV rows with mtime ordinal; returns (rows, quarantine)."""
    df = (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
        .select("*", "_metadata")
    )
    return _split_quarantine(_with_ordinal(df).drop("_metadata"))


def read_orc(
    spark: SparkSession,
    path: str,
    schema_ddl: str | None = None,
) -> DataFrame:
    """ORC rows with the mtime ordinal + source_path contract columns.

    ORC (like parquet) is self-describing and binary — a malformed
    file fails the stripe read rather than yielding rescuable rows,
    so there is no quarantine frame here; schema (when given) is
    enforced on read for batch-to-batch type stability. Columnar
    pushdown/pruning work as for parquet (ORC carries min/max stripe
    stats Spark's reader uses)."""
    r = spark.read
    if schema_ddl:
        r = r.schema(schema_ddl)
    df = r.orc(path).select("*", "_metadata")
    return _with_ordinal(df).drop("_metadata")


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink twin (snappy by default, like the parquet sinks)."""
    df.write.mode(mode).orc(path)
