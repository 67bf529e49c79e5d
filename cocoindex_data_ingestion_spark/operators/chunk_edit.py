"""Chunk-table editing: split and merge with renumbering.

Reference behavior (app/api/chunks.py):
- ``split_chunk`` (:352-431): split one chunk's text at a position
  (400 unless ``0 < pos < len``); the first part keeps the chunk id
  and number with ``end = start + len(first)``; every later chunk of
  the document is renumbered +1; a new chunk is inserted at
  ``number+1`` spanning ``[first.end, first.end + len(second))`` with
  ``metadata.split_from`` pointing at the source.
- ``merge_chunks`` (:434-513): given ≥2 chunk ids of one document
  (sorted by chunk_number), the FIRST keeps its id and number with
  ``text = ' '.join(texts)`` and ``end = last.end``; the others are
  deleted; chunks numbered past the LAST selected are renumbered
  ``-(k-1)``; ``metadata.merged_from`` records the absorbed ids.

Spark-first: the API edits one chunk at a time; at engine scale the
natural unit is a BATCH of edits applied in one pass. Both operators
take a small edit table, broadcast it onto the corpus-sized chunk
table, and compute the post-edit table map-side — the renumber shift
for a row is a closed form over the (tiny, per-document) edit list,
so sequential API application and the batch form agree whenever edits
don't overlap. No shuffle touches the chunk table beyond the
broadcast hash join; new sibling rows come from the matched rows
themselves (a union of two narrow projections).

Determinism: the API's DB-generated UUID for the new sibling becomes
``md5(chunk_id || ':' || split_position)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_chunks(
    chunks: DataFrame,
    splits: DataFrame,
    doc_col: str = "document_id",
    id_col: str = "chunk_id",
    num_col: str = "chunk_number",
    text_col: str = "chunk_text",
    start_col: str = "start_position",
    end_col: str = "end_position",
) -> DataFrame:
    """Apply a batch of chunk splits (``splits``: ``id_col``,
    ``split_position``). Splits whose position falls outside
    ``(0, len)`` are ignored — the API's 400 analogue. Returns the
    post-edit chunk table with a nullable ``split_from`` column."""
    sp = splits.select(
        F.col(id_col).alias("__sid"), F.col("split_position").alias("__pos")
    )
    annotated = chunks.join(
        F.broadcast(sp), chunks[id_col] == F.col("__sid"), "left"
    ).withColumn(
        "__valid",
        (F.col("__pos") > 0) & (F.col("__pos") < F.length(F.col(text_col))),
    )
    # per-document list of valid split target numbers → renumber shift
    targets = (
        annotated.filter(F.col("__valid"))
        .groupBy(doc_col)
        .agg(F.sort_array(F.collect_list(F.col(num_col))).alias("__tnums"))
    )
    withshift = annotated.join(F.broadcast(targets), doc_col, "left").withColumn(
        "__shift",
        F.coalesce(
            F.size(
                F.filter(
                    F.col("__tnums"),
                    lambda t: t < F.col(num_col),
                )
            ),
            F.lit(0),
        ),
    )
    is_target = F.col("__valid") & F.col("__sid").isNotNull()
    base_cols = [c for c in chunks.columns]
    first = withshift.select(
        *[
            F.when(is_target, F.substring(F.col(text_col), 1, F.col("__pos")))
            .otherwise(F.col(text_col))
            .alias(c)
            if c == text_col
            else (F.col(num_col) + F.col("__shift")).alias(c)
            if c == num_col
            else F.when(
                is_target, F.col(start_col) + F.col("__pos")
            ).otherwise(F.col(end_col)).alias(c)
            if c == end_col
            else F.col(c).alias(c)
            for c in base_cols
        ],
        F.lit(None).cast("string").alias("split_from"),
    )
    second = (
        withshift.filter(is_target)
        .select(
            *[
                F.md5(
                    F.concat(
                        F.col(id_col), F.lit(":"), F.col("__pos").cast("string")
                    )
                ).alias(c)
                if c == id_col
                else (F.col(num_col) + F.col("__shift") + 1).alias(c)
                if c == num_col
                else F.expr(
                    f"substring({text_col}, __pos + 1, "
                    f"length({text_col}) - __pos)"
                ).alias(c)
                if c == text_col
                else (F.col(start_col) + F.col("__pos")).alias(c)
                if c == start_col
                else (
                    F.col(start_col) + F.length(F.col(text_col))
                ).alias(c)
                if c == end_col
                else F.col(c).alias(c)
                for c in base_cols
            ],
            F.col(id_col).alias("split_from"),
        )
    )
    return first.unionByName(second)


def merge_chunks(
    chunks: DataFrame,
    groups: DataFrame,
    doc_col: str = "document_id",
    id_col: str = "chunk_id",
    num_col: str = "chunk_number",
    text_col: str = "chunk_text",
    start_col: str = "start_position",
    end_col: str = "end_position",
) -> DataFrame:
    """Apply a batch of chunk merges (``groups``: ``id_col``,
    ``group_id``; each group = one API merge call's id list, all from
    one document, non-overlapping between groups). Returns the
    post-edit table with ``merged_from`` (absorbed ids, number order,
    empty array for untouched rows)."""
    g = groups.select(
        F.col(id_col).alias("__gid_chunk"), F.col("group_id").alias("__grp")
    )
    annotated = chunks.join(
        F.broadcast(g), chunks[id_col] == F.col("__gid_chunk"), "left"
    )
    members = annotated.filter(F.col("__grp").isNotNull())
    # per-group fold: first/last numbers, merged text in number order,
    # last end, absorbed ids
    ginfo = members.groupBy(doc_col, "__grp").agg(
        F.min(num_col).alias("__first_num"),
        F.max(num_col).alias("__last_num"),
        F.count(F.lit(1)).alias("__k"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(num_col), F.col(text_col)))
                ),
                lambda s: s.getField(text_col),
            ),
            " ",
        ).alias("__merged_text"),
        F.max(F.struct(F.col(num_col), F.col(end_col))).alias("__last"),
        F.min(F.struct(F.col(num_col), F.col(id_col), F.col(start_col))).alias(
            "__firstrow"
        ),
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.col(num_col), F.col(id_col)))
                ),
                2,
                1 << 30,
            ),
            lambda s: s.getField(id_col),
        ).alias("__absorbed"),
    )
    # per-document list of (last_num, k) for the renumber shift
    docinfo = ginfo.groupBy(doc_col).agg(
        F.collect_list(
            F.struct(F.col("__last_num"), (F.col("__k") - 1).alias("__dec"))
        ).alias("__gends")
    )
    first_ids = ginfo.select(
        F.col("__firstrow").getField(id_col).alias("__fid"),
        F.col("__merged_text").alias("__mtext"),
        F.col("__last").getField(end_col).alias("__mend"),
        F.col("__absorbed").alias("__mfrom"),
    )
    shifted = (
        annotated.join(F.broadcast(docinfo), doc_col, "left")
        .withColumn(
            "__shift",
            F.coalesce(
                F.aggregate(
                    F.filter(
                        F.col("__gends"),
                        lambda s: s.getField("__last_num") < F.col(num_col),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, s: acc + s.getField("__dec"),
                ),
                F.lit(0).cast("long"),
            ),
        )
        .join(
            F.broadcast(first_ids),
            annotated[id_col] == F.col("__fid"),
            "left",
        )
    )
    # drop absorbed members (in a group, not the group's first row)
    kept = shifted.filter(F.col("__grp").isNull() | F.col("__fid").isNotNull())
    base_cols = [c for c in chunks.columns]
    return kept.select(
        *[
            F.coalesce(F.col("__mtext"), F.col(text_col)).alias(c)
            if c == text_col
            else (F.col(num_col) - F.col("__shift")).alias(c)
            if c == num_col
            else F.coalesce(F.col("__mend"), F.col(end_col)).alias(c)
            if c == end_col
            else F.col(c).alias(c)
            for c in base_cols
        ],
        F.coalesce(F.col("__mfrom"), F.array().cast("array<string>")).alias(
            "merged_from"
        ),
    )
