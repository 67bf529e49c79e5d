"""Entity pipeline: mention extraction → canonicalization → fuzzy
dedup → relationship extraction.

Reference behavior (SURVEY §2.7):
- LLM mention extraction with offset validation + quality filter
  (app/flows/entity_extraction_runner_v2.py:849-1020; conf >= 0.25,
  stopword/len filters). Here the deterministic core is a
  *gazetteer extractor* (dictionary matching with offsets) — the LLM
  variant plugs in through the same DataFrame contract
  (text → array<struct mention>), as an external-call pandas UDF.
- Canonicalization: group mentions by normalized (name, type)
  (document_tasks.py:854 `_canonical_key`: lower/trim).
- Fuzzy dedup: normalized-similarity pairs >= 0.85, auto-merge >=
  0.95 (entity_deduplication.py:57-162, 457-539). Blocking via
  normalized-prefix key; similarity = difflib ratio (same algorithm
  family as the reference's SequenceMatcher).
- Relationship extraction: co-occurrence within a chunk
  (relationship_extractor.py:74-483) with (src, tgt, type) dedup.

Scale notes: extraction is a per-row map (no shuffle);
canonicalization is one groupBy; fuzzy dedup joins only within
blocks (first-letter+type), the standard entity-resolution blocking;
co-occurrence is a per-chunk self-join bounded by mentions-per-chunk.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


MIN_CONFIDENCE = 0.25  # entity_extraction_runner_v2.py quality filter
AUTO_MERGE_THRESHOLD = 0.95  # entity_deduplication.py:457-539
REVIEW_THRESHOLD = 0.85

_MENTION_SCHEMA = (
    "chunk_id string, document_id string, text string, type string, "
    "start_offset int, end_offset int, confidence double"
)


def extract_mentions_gazetteer(
    chunks: DataFrame,
    gazetteer: dict[str, str],
    id_col: str = "chunk_id",
    doc_col: str = "document_id",
    text_col: str = "chunk_text",
) -> DataFrame:
    """Dictionary-based mention extraction with verbatim offsets.

    Offset contract (FIXTURES.md entity_mentions): text must appear
    verbatim at [start_offset, end_offset) — the reference validates
    and realigns LLM offsets; a gazetteer extractor is correct by
    construction. Confidence = 1.0 for exact surface matches.
    """
    import re

    terms = sorted(gazetteer, key=len, reverse=True)
    pattern = re.compile(
        r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b", re.IGNORECASE
    )
    lower_map = {t.lower(): (t, gazetteer[t]) for t in terms}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, did, text in zip(pdf[id_col], pdf[doc_col], pdf[text_col]):
                for m in pattern.finditer(text or ""):
                    surface = m.group(0)
                    _, etype = lower_map[surface.lower()]
                    rows.append(
                        (str(cid), str(did), surface, etype, m.start(), m.end(), 1.0)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "chunk_id", "document_id", "text", "type",
                    "start_offset", "end_offset", "confidence",
                ],
            )

    # NO spread here (r11): the compiled gazetteer regex scan is cheap
    # per row — interleaved A/B (min-of-4) showed the guard's exchange
    # a net loss on every benched caller (entity_extraction_compare
    # 1.41→0.96 s, entity_type_confusion 1.52→0.94 s,
    # entity_cooccurrence 1.11→0.85 s with the spread removed). Same
    # per-site evidence rule as dedup_minhash_fast (r10).
    return chunks.select(
        F.col(id_col), F.col(doc_col), F.col(text_col)
    ).mapInPandas(run, _MENTION_SCHEMA)


def quality_filter(mentions: DataFrame) -> DataFrame:
    """Reference mention quality filter: confidence >= 0.25, len > 1,
    not all-punctuation (entity_extraction_runner_v2.py:849-1020)."""
    return mentions.filter(
        (F.col("confidence") >= MIN_CONFIDENCE)
        & (F.length(F.trim(F.col("text"))) > 1)
        & (F.col("text").rlike("[A-Za-z0-9]"))
    )


def canonical_key(name_col: str = "text") -> F.Column:
    """lower/trim normalization (document_tasks.py:854)."""
    return F.lower(F.trim(F.col(name_col)))


def canonicalize(mentions: DataFrame) -> DataFrame:
    """Mentions → canonical entities by normalized (name, type):
    id = md5 key (deterministic), counts + mean confidence."""
    return (
        mentions.groupBy(
            canonical_key().alias("name"), F.col("type")
        )
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("document_id").alias("n_documents"),
            F.avg("confidence").alias("avg_confidence"),
        )
        .withColumn("entity_id", F.md5(F.concat_ws("\x00", "name", "type")))
    )


def fuzzy_dedup_pairs(
    entities: DataFrame,
    threshold: float = REVIEW_THRESHOLD,
    name_col: str = "name",
    type_col: str = "type",
) -> DataFrame:
    """Similar-entity pairs within (first-char, type) blocks.

    difflib.SequenceMatcher ratio — the same algorithm as the
    reference's similarity core (entity_deduplication.py:57-162).
    Blocking bounds the quadratic cost to block sizes; at 100 TB use
    a second blocking key (e.g. sorted-token prefix) before this."""
    base = entities.select(
        F.col(name_col).alias("name"), F.col(type_col).alias("type")
    ).withColumn("_blk", F.concat_ws("#", F.substring("name", 1, 1), "type"))
    a, b = base.alias("a"), base.alias("b")
    cand = a.join(
        b,
        (F.col("a._blk") == F.col("b._blk")) & (F.col("a.name") < F.col("b.name")),
    ).select(
        F.col("a.name").alias("name_a"),
        F.col("b.name").alias("name_b"),
        F.col("a.type").alias("type"),
    )

    schema = "name_a string, name_b string, type string, similarity double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from difflib import SequenceMatcher

        for pdf in batches:
            pdf = pdf.copy()
            pdf["similarity"] = [
                round(SequenceMatcher(None, x, y).ratio(), 4)
                for x, y in zip(pdf["name_a"], pdf["name_b"])
            ]
            yield pdf

    return cand.mapInPandas(score, schema).filter(
        F.col("similarity") >= threshold
    )


def merge_entities(
    entities: DataFrame, pairs: DataFrame, auto_threshold: float = AUTO_MERGE_THRESHOLD
) -> DataFrame:
    """Auto-merge pairs >= 0.95 into the lexicographically-min name
    (union aliases; the reference's merge_entity_data,
    entity_deduplication.py:370-456). Transitive merges via
    connected components over the merge pairs."""
    from cocoindex_data_ingestion_spark.operators.dedup import connected_components

    to_merge = pairs.filter(F.col("similarity") >= auto_threshold).select(
        F.concat_ws("#", "name_a", "type").alias("id_a"),
        F.concat_ws("#", "name_b", "type").alias("id_b"),
    )
    comps = connected_components(to_merge)
    keyed = entities.withColumn("_nk", F.concat_ws("#", "name", "type"))
    merged = (
        keyed.join(comps, keyed._nk == comps.node_id, "left")
        .withColumn("canonical_key", F.coalesce("component", "_nk"))
        .groupBy("canonical_key", "type")
        .agg(
            F.min("name").alias("name"),
            F.sum("n_mentions").alias("n_mentions"),
            F.collect_set("name").alias("aliases"),
        )
        .drop("canonical_key")
    )
    return merged


def cooccurrence_relationships(
    mentions: DataFrame, rel_type: str = "CO_OCCURS_WITH"
) -> DataFrame:
    """Relationships from same-chunk co-occurrence
    (relationship_extractor.py rule-based path): entity pairs that
    appear in the same chunk, deduped on (src, tgt, type), with
    occurrence counts as confidence evidence."""
    m = mentions.select(
        "chunk_id", canonical_key().alias("name"), "type"
    ).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (
                F.concat_ws("#", "a.name", "a.type")
                < F.concat_ws("#", "b.name", "b.type")
            ),
        )
        .groupBy(
            F.col("a.name").alias("source_name"),
            F.col("a.type").alias("source_type"),
            F.col("b.name").alias("target_name"),
            F.col("b.type").alias("target_type"),
        )
        .agg(F.countDistinct("a.chunk_id").alias("n_cooccurrences"))
        .withColumn("relationship_type", F.lit(rel_type))
    )


# -- multi-model extraction comparison (llm_service.py:711-864) ----------------


def compare_extraction_runs(
    run_a: DataFrame,
    run_b: DataFrame,
    doc_col: str = "document_id",
    round_to: int = 4,
) -> DataFrame:
    """Per-document agreement record between two extraction runs —
    the ``llm_comparisons`` table the reference fills from
    ``compare_outputs`` / ``extract_entities_with_comparison``
    (app/services/llm_service.py:711-864): entities keyed by
    ``(lower(name), type)``; an entity is *agreed* when both runs
    produced it for the document.

    Output per document (docs where ≥1 run found anything):
    ``n_a`` / ``n_b`` distinct entities per run, ``n_agreed``,
    precision of A against B (``n_agreed/n_a``), recall
    (``n_agreed/n_b``), and Jaccard — each run treated as the other's
    pseudo-truth, which is exactly what cross-model agreement means.

    Plan: one distinct per run + one full outer join on
    (doc, name, type) + one per-doc aggregate — all partitioned by
    the same keys, integer counts until the final ratios.
    """
    from ..functions.compare import stable_round

    def keyed(run: DataFrame, tag: str) -> DataFrame:
        return run.select(
            F.col(doc_col).alias("_doc"),
            canonical_key().alias("_name"),
            F.col("type").alias("_type"),
        ).distinct().withColumn(tag, F.lit(1))

    joined = keyed(run_a, "_in_a").join(
        keyed(run_b, "_in_b"), ["_doc", "_name", "_type"], "full_outer"
    )
    agg = joined.groupBy("_doc").agg(
        F.sum(F.coalesce(F.col("_in_a"), F.lit(0))).alias("n_a"),
        F.sum(F.coalesce(F.col("_in_b"), F.lit(0))).alias("n_b"),
        F.sum(
            F.coalesce(F.col("_in_a"), F.lit(0))
            * F.coalesce(F.col("_in_b"), F.lit(0))
        ).alias("n_agreed"),
    )
    na, nb, ng = F.col("n_a"), F.col("n_b"), F.col("n_agreed")
    ratio = lambda num, den: F.when(  # noqa: E731
        den > 0, stable_round(num.cast("double") / den, round_to)
    )
    return agg.select(
        F.col("_doc").alias(doc_col),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ng.cast("long").alias("n_agreed"),
        ratio(ng, na).alias("precision_a"),
        ratio(ng, nb).alias("recall_a"),
        ratio(ng, na + nb - ng).alias("jaccard"),
    )


def type_confusion_matrix(
    run_a: DataFrame,
    run_b: DataFrame,
    doc_col: str = "document_id",
) -> DataFrame:
    """Type-level disagreement between two extraction runs: for every
    (document, name) surface BOTH runs extracted, count the
    ``(type_a, type_b)`` combinations. The diagonal is type
    agreement; off-diagonal cells are exactly the confusions a
    multi-model comparison is run to find (llm_service.py:826-853
    keys entities by name+type, so a type disagreement silently
    doubles an entity there — this matrix makes it visible).
    """
    a = run_a.select(
        F.col(doc_col).alias("_doc"),
        canonical_key().alias("_name"),
        F.col("type").alias("type_a"),
    ).distinct()
    b = run_b.select(
        F.col(doc_col).alias("_doc"),
        canonical_key().alias("_name"),
        F.col("type").alias("type_b"),
    ).distinct()
    return (
        a.join(b, ["_doc", "_name"])
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def consensus_entities(
    run_a: DataFrame,
    run_b: DataFrame,
    names: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """Corpus-level consensus list (llm_service.py:824-864): entities
    keyed by (lower(name), type) with the set of runs that produced
    them, max confidence across runs, and document support — ordered
    by (n_sources, confidence) like the reference's consensus sort."""
    def keyed(run: DataFrame, tag: str) -> DataFrame:
        return run.select(
            canonical_key().alias("name"),
            "type",
            F.col("confidence"),
            F.col("document_id"),
        ).groupBy("name", "type").agg(
            F.max("confidence").alias(f"conf_{tag}"),
            F.countDistinct("document_id").alias(f"docs_{tag}"),
        )

    a, b = keyed(run_a, "a"), keyed(run_b, "b")
    j = a.join(b, ["name", "type"], "full_outer")
    n_sources = (
        F.when(F.col("conf_a").isNotNull(), 1).otherwise(0)
        + F.when(F.col("conf_b").isNotNull(), 1).otherwise(0)
    )
    return j.select(
        "name",
        "type",
        n_sources.cast("long").alias("n_sources"),
        F.greatest(
            F.coalesce(F.col("conf_a"), F.lit(float("-inf"))),
            F.coalesce(F.col("conf_b"), F.lit(float("-inf"))),
        ).alias("confidence"),
        F.concat_ws(
            ",",
            *[
                F.when(F.col(f"conf_{t}").isNotNull(), F.lit(name))
                for t, name in zip(("a", "b"), names)
            ],
        ).alias("sources"),
        F.coalesce(F.col("docs_a"), F.lit(0)).cast("long").alias("n_docs_a"),
        F.coalesce(F.col("docs_b"), F.lit(0)).cast("long").alias("n_docs_b"),
    )
