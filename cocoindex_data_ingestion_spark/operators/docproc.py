"""App-level DocumentProcessor semantics: text preprocessing and
markdown section extraction.

Reference behavior (app/services/document_processor.py):
- ``preprocess_text`` (:204-212): collapse all whitespace runs to a
  single space, drop characters outside the keep-set
  ``[\\w\\s.,;:!?\\-()"'/]``, strip. (The reference's Python ``\\w``
  is unicode-aware; Java and RE2 ``\\w`` are ASCII — identical on
  ASCII corpora, documented divergence beyond.)
- ``extract_sections`` (:214-253): split content into lines; a line
  matching ``^(#{1,6})\\s+(.+)$`` starts a new section with
  ``level = len(hashes)`` and ``title = group(2)`` (trailing
  whitespace preserved, exactly as the reference's capture); all
  following non-header lines join with newlines into the section
  content, stripped. Lines BEFORE the first header are dropped
  (the reference never saves the ``current_section is None``
  accumulator). Seven or more hashes, or no whitespace after the
  hashes, is not a header.

Spark-first: both are pure JVM expressions — the section walk is a
posexplode over lines + a running header count (one window per doc)
+ a per-section aggregate; no UDFs, no driver loops.

Scale: the line explode is map-side; both the running count and the
section aggregate partition by document id, so state per group is one
document's lines — a single hash exchange on doc id, no skew beyond
document length itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# document_processor.py:219 — the header pattern (re.match semantics:
# anchored at line start; $ provided per-line by the split)
HEADER_RE = r"^#{1,6}\s+.+$"
# keep-set of preprocess_text (:210)
_DROP_RE = r"""[^\w\s.,;:!?\-()"'/]"""
_WS_STRIP_RE = r"^\s+|\s+$"


def strip_ws(c: Column) -> Column:
    """Python ``str.strip()`` twin: ALL whitespace, not just spaces
    (F.trim strips spaces only)."""
    return F.regexp_replace(c, _WS_STRIP_RE, "")


def preprocess_text_col(c: Column) -> Column:
    """``preprocess_text`` (:204-212) as one codegen projection."""
    collapsed = F.regexp_replace(c, r"\s+", " ")
    kept = F.regexp_replace(collapsed, _DROP_RE, "")
    return strip_ws(kept)


def extract_sections(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """``extract_sections`` (:214-253) over a corpus: one row per
    markdown section — ``(*id_cols, section_idx, level, title,
    content)`` with ``section_idx`` the 1-based header order.
    Preamble lines (before any header) are dropped, faithfully."""
    ids = [F.col(c) for c in id_cols]
    lines = docs.select(
        *ids,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("is_header", F.col("line").rlike(HEADER_RE))
    w = (
        Window.partitionBy(*id_cols)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = lines.withColumn(
        "section_idx", F.sum(F.col("is_header").cast("int")).over(w)
    ).filter(F.col("section_idx") > 0)
    return (
        grouped.groupBy(*id_cols, "section_idx")
        .agg(
            F.max(
                F.when(
                    F.col("is_header"),
                    F.length(F.regexp_extract(F.col("line"), r"^(#{1,6})\s", 1)),
                )
            ).alias("level"),
            F.max(
                F.when(
                    F.col("is_header"),
                    F.regexp_extract(F.col("line"), r"^#{1,6}\s+(.+)$", 1),
                )
            ).alias("title"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("is_header"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
            ).alias("raw_content"),
        )
        .select(
            *id_cols,
            "section_idx",
            "level",
            "title",
            strip_ws(F.col("raw_content")).alias("content"),
        )
    )
