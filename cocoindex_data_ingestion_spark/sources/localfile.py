"""LocalFile source connector.

Reference behavior (src/ops/sources/local_file.rs:12-37,94-112):
key = filename, value = content (Str or Bytes), include/exclude
globs, no change capture (rescan); ordinal = mtime µs
(src/ops/interface.rs:34-49).

Spark mapping: ``binaryFile`` format (content + path + mtime +
length in one scan) with ``pathGlobFilter``; exclude globs applied
as a filter on path (Spark has no native exclude). The same
directory read through ``readStream`` (file source) is the
change-capture variant — new files arrive as micro-batches, which is
the AmazonS3/SQS change_stream() analogue (amazon_s3.rs:180-236).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _glob_to_regex(glob: str) -> str:
    """Filename glob → anchored Java-compatible regex (driver-side,
    once). Supports ``*``, ``?`` and ``[...]`` classes — the subset
    the reference's exclude patterns use (local_file.rs:94-112)."""
    out, i = [], 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = glob.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                body = glob[i + 1:j]
                if body.startswith("!"):
                    body = "^" + body[1:]
                out.append("[" + body + "]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "".join(out)


def read_local_files(
    spark: SparkSession,
    path: str,
    include_glob: str | None = None,
    exclude_globs: list[str] | None = None,
    binary: bool = True,
    recursive: bool = True,
) -> DataFrame:
    """KTable of files: key=path, content, ordinal=mtime µs.

    Output columns: path (key), filename, content (binary) or
    content_text, length, ordinal."""
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", str(recursive).lower())
    )
    if include_glob:
        reader = reader.option("pathGlobFilter", include_glob)
    df = reader.load(path)

    if exclude_globs:
        # globs translate to one anchored regex on the driver; the
        # filter stays in whole-stage codegen (a row-at-a-time Python
        # UDF here would sit on the 100 TB file-listing path)
        pattern = "^(" + "|".join(_glob_to_regex(g) for g in exclude_globs) + ")$"
        filename = F.element_at(F.split("path", "/"), -1)
        df = df.filter(~filename.rlike(pattern))

    out = df.select(
        F.col("path"),
        F.element_at(F.split("path", "/"), -1).alias("filename"),
        F.col("content"),
        F.col("length"),
        F.unix_micros(F.col("modificationTime")).alias("ordinal"),
    )
    if not binary:
        out = out.withColumn(
            "content_text", F.col("content").cast("string")
        ).drop("content")
    return out


def stream_local_files(
    spark: SparkSession,
    path: str,
    include_glob: str | None = None,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Change-capture variant: the directory as a file-source stream
    (new files = source changes; the reference's change_stream())."""
    reader = (
        spark.readStream.format("binaryFile")
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if include_glob:
        reader = reader.option("pathGlobFilter", include_glob)
    return reader.load(path)
