"""Notion block → markdown conversion (pure transformation layer).

Reference behavior (app/connectors/notion_connector.py):
- ``_get_text_from_rich_text`` (:297-306): plain-text concat (the
  input here is already that joined text).
- ``_block_to_markdown`` (:346-577): per-type templates — headings
  ``#·text`` with nested children joined by blank lines (no indent),
  bullets ``-·text`` / to-dos ``- [x]·text`` / toggles ``▼·text``
  with children indented two spaces, numbered items ``1.·text``
  (always ``1.``) with THREE-space indent, quotes, fenced code with
  language, dividers, child page/database links, media placeholders,
  bookmark (caption or url), embeds, ``[Table of Contents]``,
  ``link_to_page``, and ``[{type}]`` for unknown types. Children are
  fetched only for table/heading/bulleted/numbered/to_do/toggle —
  a paragraph's children are ignored, faithfully. Empty child
  markdown is skipped at every level (``if child_markdown:``).
- ``_fetch_table_content`` (:579-622): ``| a | b |`` rows from
  ``table_row`` children with a ``| --- | --- |`` separator after the
  FIRST row; no rows → ``[Empty table]``.
- ``_fetch_page_content`` (:308-344): page = non-empty top-level
  block markdowns joined by blank lines.
- ``get_content_hash`` (:624-633): sha256 of the page content.

Spark-first: the recursive API walk becomes a bottom-up fold over a
BLOCK TABLE ``(page_id, block_id, parent_id, pos, block_type, text,
checked, language, url, ref_id, title, caption, cells,
has_children)``: base templates are one codegen CASE; each fold round
aggregates children (sorted structs, empty markdown filtered) onto
parents and re-applies the per-parent-type assembly, so after k
rounds every subtree of height ≤ k+1 is exact. Rounds = max_depth-1
driver-side joins — depth is a schema property (Notion nesting is
shallow), never data volume.

Scale: each round is one groupBy(parent_id) + one hash join on
block_id — both partition-local after an exchange on the id; sibling
lists are bounded by Notion's page size, so collect_list state is
small and the fold is linear in block count per round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# block types whose children are fetched (:366,382,409,438,468,497)
NESTING_TYPES = [
    "table", "heading_1", "heading_2", "heading_3",
    "bulleted_list_item", "numbered_list_item", "to_do", "toggle",
]


def _indent(md: Column, spaces: int) -> Column:
    """``"\\n".join(f"{pad}{line}" ...)`` — prefix EVERY line
    (including empty ones), exactly as the reference (:421,:450)."""
    pad = " " * spaces
    return F.concat(
        F.lit(pad), F.replace(md, F.lit("\n"), F.lit("\n" + pad))
    )


def base_markdown() -> Column:
    """The leaf template of ``_block_to_markdown`` (children attached
    by the fold). Assumes columns block_type/text/checked/language/
    url/ref_id/title/caption; missing fields may be null."""
    t = F.col("block_type")
    text = F.coalesce(F.col("text"), F.lit(""))
    url = F.coalesce(F.col("url"), F.lit(""))
    caption = F.coalesce(F.col("caption"), F.lit(""))
    return (
        F.when(
            t == "link_preview",
            F.when(
                url != "",
                F.concat(F.lit("[Link: "), url, F.lit("]("), url, F.lit(")")),
            ).otherwise(F.lit("[Link]")),
        )
        .when(t == "table", F.lit("[Empty table]"))  # rows attach in the fold
        .when(t == "paragraph", text)
        .when(
            t.isin("heading_1", "heading_2", "heading_3"),
            F.concat(
                F.expr("repeat('#', CAST(substring(block_type, -1) AS INT))"),
                F.lit(" "),
                text,
            ),
        )
        .when(t == "bulleted_list_item", F.concat(F.lit("- "), text))
        .when(t == "numbered_list_item", F.concat(F.lit("1. "), text))
        .when(
            t == "to_do",
            F.concat(
                F.lit("- ["),
                F.when(F.coalesce(F.col("checked"), F.lit(False)), F.lit("x"))
                .otherwise(F.lit(" ")),
                F.lit("] "),
                text,
            ),
        )
        .when(t == "toggle", F.concat(F.lit("▼ "), text))
        .when(t == "quote", F.concat(F.lit("> "), text))
        .when(
            t == "code",
            F.concat(
                F.lit("```"), F.coalesce(F.col("language"), F.lit("")),
                F.lit("\n"), text, F.lit("\n```"),
            ),
        )
        .when(t == "divider", F.lit("---"))
        .when(
            t == "child_page",
            F.concat(
                F.lit("["),
                F.coalesce(F.col("title"), F.lit("Untitled")),
                F.lit("](notion://"), F.col("block_id"), F.lit(")"),
            ),
        )
        .when(
            t == "child_database",
            F.concat(
                F.lit("["),
                F.coalesce(F.col("title"), F.lit("Database")),
                F.lit("](notion://"), F.col("block_id"), F.lit(")"),
            ),
        )
        .when(t == "image", F.concat(F.lit("!["), caption, F.lit("](image)")))
        .when(t == "video",
              F.concat(F.lit("[Video: "), caption, F.lit("](video)")))
        .when(t == "file",
              F.concat(F.lit("[File: "), caption, F.lit("](file)")))
        .when(t == "pdf", F.concat(F.lit("[PDF: "), caption, F.lit("](pdf)")))
        .when(
            t == "bookmark",
            F.concat(
                F.lit("["),
                F.when(caption != "", caption).otherwise(url),
                F.lit("]("), url, F.lit(")"),
            ),
        )
        .when(t == "embed", F.concat(F.lit("[Embed]("), url, F.lit(")")))
        .when(t == "table_of_contents", F.lit("[Table of Contents]"))
        .when(
            t == "link_to_page",
            F.concat(
                F.lit("[Link to page](notion://"),
                F.coalesce(F.col("ref_id"), F.lit("")), F.lit(")"),
            ),
        )
        .when(t == "table_row", F.lit(""))  # rendered by the parent table
        .otherwise(F.concat(F.lit("["), t, F.lit("]")))
    )


def _assemble(parent_md: Column, kids: Column) -> Column:
    """Attach sorted child structs (pos, block_type, md, cells) to a
    parent according to its type."""
    t = F.col("block_type")
    nonempty = F.filter(
        kids, lambda k: k.getField("md").isNotNull() & (k.getField("md") != "")
    )
    mds = lambda arr: F.transform(arr, lambda k: k.getField("md"))  # noqa: E731

    # table assembly (:599-618) — FAITHFUL quirk: the reference
    # enumerates ALL children and appends the header separator only
    # at child index 0, so a non-table_row first child means no
    # separator at all; non-table_row children emit nothing.
    row_lines = F.filter(
        F.transform(
            kids,
            lambda k, i: F.when(
                k.getField("block_type") == "table_row",
                F.concat(
                    F.lit("| "),
                    F.array_join(k.getField("cells"), " | "),
                    F.lit(" |"),
                    F.when(
                        i == 0,
                        F.concat(
                            F.lit("\n|"),
                            F.repeat(
                                F.lit(" --- |"),
                                F.size(k.getField("cells")),
                            ),
                        ),
                    ).otherwise(F.lit("")),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    table_md = F.when(
        F.size(row_lines) > 0, F.array_join(row_lines, "\n")
    ).otherwise(F.lit("[Empty table]"))

    heading_join = F.when(
        F.size(nonempty) > 0,
        F.concat(parent_md, F.lit("\n\n"), F.array_join(mds(nonempty), "\n\n")),
    ).otherwise(parent_md)

    def indented_join(spaces: int) -> Column:
        ind = F.transform(nonempty, lambda k: _indent(k.getField("md"), spaces))
        return F.when(
            F.size(nonempty) > 0,
            F.concat(parent_md, F.lit("\n"), F.array_join(ind, "\n")),
        ).otherwise(parent_md)

    return (
        F.when(t == "table", table_md)
        .when(t.isin("heading_1", "heading_2", "heading_3"), heading_join)
        .when(t.isin("bulleted_list_item", "to_do", "toggle"), indented_join(2))
        .when(t == "numbered_list_item", indented_join(3))
        .otherwise(parent_md)  # children ignored for other types
    )


def block_markdown(blocks: DataFrame, max_depth: int = 3) -> DataFrame:
    """Per-block markdown after the bottom-up fold (adds ``md``)."""
    cur = blocks.withColumn("md", base_markdown())
    for _ in range(max(0, max_depth - 1)):
        kids = (
            cur.filter(F.col("parent_id").isNotNull())
            .select(
                F.col("parent_id").alias("__kid_parent"),
                F.struct(
                    F.col("pos"),
                    F.col("block_type"),
                    F.col("md"),
                    F.col("cells"),
                ).alias("__kid"),
            )
            .groupBy("__kid_parent")
            .agg(F.array_sort(F.collect_list(F.col("__kid"))).alias("__kids"))
        )
        cur = (
            blocks.withColumn("md", base_markdown())
            .join(kids, F.col("block_id") == F.col("__kid_parent"), "left")
            .drop("__kid_parent")
            .withColumn(
                "md",
                F.when(
                    F.col("__kids").isNotNull(),
                    _assemble(F.col("md"), F.col("__kids")),
                ).otherwise(F.col("md")),
            )
            .drop("__kids")
        )
    return cur


def pages_markdown(blocks: DataFrame, max_depth: int = 3) -> DataFrame:
    """``_fetch_page_content`` (:337-344) + ``get_content_hash``:
    one row per page — non-empty top-level markdowns joined by blank
    lines, plus the sha256 change-detection hash."""
    md = block_markdown(blocks, max_depth=max_depth)
    top = md.filter(F.col("parent_id").isNull() & (F.col("md") != ""))
    return (
        top.groupBy("page_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("md")))
                    ),
                    lambda s: s.getField("md"),
                ),
                "\n\n",
            ).alias("content")
        )
        .withColumn("content_hash", F.sha2(F.col("content"), 256))
    )
