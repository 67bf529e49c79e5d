"""Canonical entity descriptions + document metadata extraction.

Reference behavior:
- ``CanonicalEntityDescriptionService``
  (app/services/canonical_description_service.py): per canonical
  entity, build ≤6 deduped evidence snippets
  (``Mention: .. | Summary: .. | Context: .. | Attributes: ..``,
  whitespace-normalized, 220-char caps) and ask an LLM for a ≤280-char
  description; no evidence and no previous description → skip;
  LLM unavailable → keep previous.
- ``MetadataExtractionService`` / ``DocumentMetadata``
  (app/services/llm_service.py:67-77): 9-field metadata record
  (title, author, department, category, tags, summary, key_topics,
  sentiment, confidence) extracted per document.

Spark-first split: everything deterministic (evidence prep, snippet
dedup, the heuristic metadata extractor) runs JVM-side or in plain
Python; ONLY the LLM call is a pluggable per-batch function with a
deterministic double as default — same contract as
operators/embedding (external-call pandas UDF, swap via config).

Scale: canonical_descriptions is one groupBy on entity id with the
evidence list capped *inside the aggregation* (slice after
sort_array), so state per entity is bounded; the describe hook sees
≤ max_evidence_snippets strings per entity. extract_document_metadata
is a single scan of pure expressions.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.parallel import spread_python_stage

MAX_EVIDENCE_SNIPPETS = 6  # canonical_description_service.py:13
MAX_DESCRIPTION_CHARS = 280


def clean_text(col, max_length: int | None = None):
    """Column twin of _clean_text (:16-23): collapse whitespace;
    optional trim to max_length with '...'."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.trim(F.regexp_replace(c, r"\s+", " "))
    if max_length is None:
        return cleaned
    return F.when(
        F.length(cleaned) > max_length,
        F.concat(
            F.rtrim(F.substring(cleaned, 1, max_length - 3)), F.lit("...")
        ),
    ).otherwise(cleaned)


def evidence_snippet(mention_col, context_col):
    """One formatted evidence snippet (:125-160, mention+context
    fields; summary/attributes join the same way when present)."""
    return F.concat(
        F.lit("Mention: "),
        clean_text(mention_col),
        F.when(
            F.length(clean_text(context_col, 220)) > 0,
            F.concat(F.lit(" | Context: "), clean_text(context_col, 220)),
        ).otherwise(F.lit("")),
    )


def default_describe_fn(batch: pd.DataFrame) -> pd.Series:
    """Deterministic LLM double: evidence-grounded template honoring
    the service's contract (≤280 chars; 'Insufficient evidence.' when
    nothing concrete; previous kept when no new evidence)."""
    out = []
    for _, row in batch.iterrows():
        ev = row["evidence"]
        evidence = list(ev) if ev is not None and len(ev) else []
        prev = (row.get("previous_description") or "").strip()
        if not evidence:
            out.append(prev if prev else None)
            continue
        first = evidence[0]
        desc = f"{row['name']} ({row['type']}): {first}"
        if len(desc) > MAX_DESCRIPTION_CHARS:
            desc = desc[: MAX_DESCRIPTION_CHARS - 3].rstrip() + "..."
        out.append(desc)
    return pd.Series(out, dtype="object")


def canonical_descriptions(
    mentions: DataFrame,
    describe_fn: Callable[[pd.DataFrame], pd.Series] | None = None,
    max_evidence_snippets: int = MAX_EVIDENCE_SNIPPETS,
    previous: DataFrame | None = None,
) -> DataFrame:
    """mentions(name, type, text, context) → (entity_id, name, type,
    n_evidence, description).

    Evidence prep is fully deterministic Spark: snippets formatted,
    deduped, sorted for stable order, capped per entity inside the
    agg. ``describe_fn`` receives a pandas batch with columns
    (entity_id, name, type, evidence, previous_description) and
    returns the description Series — the real service plugs its LLM
    call here; the default is the deterministic double."""
    fn = describe_fn or default_describe_fn

    ev = mentions.select(
        F.lower(F.trim(F.col("text"))).alias("name"),
        F.col("type"),
        evidence_snippet("text", "context").alias("snippet"),
    )
    grouped = (
        ev.groupBy("name", "type")
        .agg(
            F.slice(
                F.array_sort(F.collect_set("snippet")),
                1,
                max_evidence_snippets,
            ).alias("evidence")
        )
        .withColumn(
            "entity_id", F.md5(F.concat_ws("\x00", "name", "type"))
        )
    )
    if previous is not None:
        grouped = grouped.join(
            previous.select(
                "entity_id",
                F.col("description").alias("previous_description"),
            ),
            "entity_id",
            "left",
        )
    else:
        grouped = grouped.withColumn(
            "previous_description", F.lit(None).cast("string")
        )

    schema = (
        "entity_id string, name string, type string, n_evidence int, "
        "description string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            desc = fn(pdf)
            yield pd.DataFrame(
                {
                    "entity_id": pdf["entity_id"],
                    "name": pdf["name"],
                    "type": pdf["type"],
                    "n_evidence": [
                        len(e) if e is not None else 0
                        for e in pdf["evidence"]
                    ],
                    "description": desc,
                }
            )

    return grouped.mapInPandas(run, schema)


# -- document metadata (DocumentMetadata, llm_service.py:67-77) ---------------

_POSITIVE_WORDS = ("good", "great", "excellent", "improve", "success", "easy")
_NEGATIVE_WORDS = ("bad", "fail", "error", "problem", "issue", "difficult")

_CATEGORY_HINTS = {
    "engineering": ("pipeline", "deploy", "code", "api", "system"),
    "support": ("issue", "error", "troubleshoot", "fix", "problem"),
    "research": ("analysis", "study", "measure", "experiment", "model"),
}


def extract_document_metadata(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tags: int = 3,
) -> DataFrame:
    """Heuristic (LLM-double) metadata record per document, as pure
    expressions + one token agg — the DocumentMetadata shape with the
    deterministic fields filled:

    - title: first line, whitespace-cleaned, ≤80 chars
    - summary: cleaned text, ≤220 chars
    - tags: top-``n_tags`` content tokens by frequency (ties: token
      asc) — one explode + window, no UDF
    - category: keyword-hint vote (engineering/support/research/None)
    - sentiment: positive/negative word-count heuristic
    - confidence: fraction of fields populated

    The LLM path replaces this wholesale via ``metadata_udf_hook``
    with the same output schema (external-call contract)."""
    from pyspark.sql import Window

    from cocoindex_data_ingestion_spark.functions.text import (
        is_content_token, tokenize,
    )

    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    ).filter(is_content_token("token"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("c").desc(), F.col("token").asc()
    )
    tags = (
        toks.groupBy(id_col, "token")
        .agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_tags)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("rn", "token"))).alias("t"))
        .select(
            id_col,
            F.transform(F.col("t"), lambda x: x["token"]).alias("tags"),
        )
    )

    text_lower = F.lower(F.col(text_col))

    def _count_any(words) -> F.Column:
        out = F.lit(0)
        for wd in words:
            out = out + F.when(text_lower.contains(wd), 1).otherwise(0)
        return out

    category = F.lit(None).cast("string")
    for cat, kws in reversed(list(_CATEGORY_HINTS.items())):
        cond = None
        for kw in kws:
            c = text_lower.contains(kw)
            cond = c if cond is None else (cond | c)
        category = F.when(cond, F.lit(cat)).otherwise(category)

    pos, neg = _count_any(_POSITIVE_WORDS), _count_any(_NEGATIVE_WORDS)
    base = docs.select(
        F.col(id_col),
        clean_text(
            F.element_at(F.split(F.col(text_col), "\n"), 1), 80
        ).alias("title"),
        clean_text(F.col(text_col), 220).alias("summary"),
        category.alias("category"),
        F.when(pos > neg, "positive")
        .when(neg > pos, "negative")
        .otherwise("neutral")
        .alias("sentiment"),
    )
    out = base.join(tags, id_col, "left").withColumn(
        "tags", F.coalesce(F.col("tags"), F.array().cast("array<string>"))
    )
    populated = (
        F.when(F.length("title") > 0, 1).otherwise(0)
        + F.when(F.length("summary") > 0, 1).otherwise(0)
        + F.when(F.col("category").isNotNull(), 1).otherwise(0)
        + F.when(F.size("tags") > 0, 1).otherwise(0)
    )
    return out.select(
        id_col, "title", "summary", "category", "sentiment", "tags",
        (populated / F.lit(4.0)).alias("confidence"),
    )


def metadata_udf_hook(
    docs: DataFrame,
    extract_fn: Callable[[pd.Series], pd.DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """External-LLM metadata path: ``extract_fn(texts) -> DataFrame``
    with columns (title, author, department, category, tags, summary,
    key_topics, sentiment, confidence) — the full DocumentMetadata
    record. Arrow-batched; retry/rate-limit wrap via functions/retry
    like the embedding hook."""
    schema = (
        f"{id_col} long, title string, author string, department string, "
        "category string, tags array<string>, summary string, "
        "key_topics array<string>, sentiment string, confidence double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = extract_fn(pdf[text_col])
            meta.insert(0, id_col, pdf[id_col].values)
            yield meta

    return spread_python_stage(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema)


# -- access-control metadata (app/api/query.py:29-47) -------------------------

DEPARTMENTS = ("engineering", "finance", "legal", "hr")
SECURITY_LEVELS = ("public", "internal", "confidential")


def derive_access_metadata(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach the reference's access-control payload fields —
    ``metadata.department`` and ``metadata.security_level``
    (app/api/query.py:29-47: multi-select filters applied to
    retrieval before prompting) — as typed columns.

    In the reference these are LLM/user-assigned payload values
    stored in Qdrant; this deterministic double derives them from the
    id (``id % |departments|`` / ``id % |levels|``) so the filter
    semantics — IN-list composition with retrieval — are exercised
    end-to-end and oracle-checkable. The production path overwrites
    these two columns with real metadata; every downstream filter is
    a plain Catalyst predicate either way (pushes down to the scan).
    """
    n_dep, n_sec = len(DEPARTMENTS), len(SECURITY_LEVELS)
    dep = F.element_at(
        F.array(*[F.lit(d) for d in DEPARTMENTS]),
        (F.col(id_col) % n_dep + 1).cast("int"),
    )
    sec = F.element_at(
        F.array(*[F.lit(s) for s in SECURITY_LEVELS]),
        (F.col(id_col) % n_sec + 1).cast("int"),
    )
    return docs.withColumn("department", dep).withColumn("security_level", sec)


def access_filter(
    departments: tuple[str, ...] | None = None,
    security_levels: tuple[str, ...] | None = None,
):
    """The query endpoint's filter composition: each provided
    multi-select becomes an IN-list predicate; absent selects match
    everything (app/api/query.py:38-47 ``_filters_from_request``)."""
    pred = F.lit(True)
    if departments:
        pred = pred & F.col("department").isin(*departments)
    if security_levels:
        pred = pred & F.col("security_level").isin(*security_levels)
    return pred
