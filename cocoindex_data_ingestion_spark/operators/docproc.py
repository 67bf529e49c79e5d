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

from typing import Iterator

import pandas as pd
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


# -- app-level greedy recursive chunker (document_processor.py:56-114) --------

# separator hierarchy (:66-75); the trailing "" entry makes the break
# search always succeed at full window size
RECURSIVE_SEPARATORS = ["\n## ", "\n### ", "\n#### ", "\n\n", "\n", ". ", " ", ""]


def recursive_chunk_text(
    content: str,
    chunk_size: int = 1500,
    chunk_overlap: int = 200,
    min_chunk_size: int = 100,
) -> list[tuple[int, int, int, str, str]]:
    """Faithful single-doc port of ``DocumentProcessor.
    _recursive_chunk`` (:56-114). Returns (chunk_index, start, end,
    text, chunk_id) tuples.

    Semantics preserved exactly:
    - the break search scans the FIXED tail ``window[int(0.8*size):]``
      (not 0.8 of the actual window), and only when the window does
      not already reach end-of-content;
    - the first separator of the hierarchy present in the tail wins,
      breaking after its LAST occurrence in the whole window (for a
      tail offset ≥ 1 that occurrence is always > 0, so the
      reference's ``last_sep > 0`` guard never rejects);
    - the "" separator keeps the full window (``rfind('') == len``);
    - chunks whose STRIPPED text is shorter than ``min_chunk_size``
      are skipped but still advance the cursor;
    - ``end`` counts the unstripped slice, and ``chunk_id`` is
      ``md5(unstripped)[:8]`` while the stored text is stripped
      (faithful quirk);
    - the cursor advances by ``len(window) - overlap`` and the final
      partial window never searches for a break.
    """
    import hashlib

    tail_at = int(chunk_size * 0.8)
    assert tail_at >= 1, "tail offset must be >= 1 (see last_sep guard)"
    out: list[tuple[int, int, int, str, str]] = []
    n = len(content)
    cur = 0
    while cur < n:
        chunk_end = min(cur + chunk_size, n)
        chunk_text = content[cur:chunk_end]
        if chunk_end < n:
            for sep in RECURSIVE_SEPARATORS:
                if sep in chunk_text[tail_at:]:
                    last_sep = chunk_text.rfind(sep)
                    if last_sep > 0:
                        chunk_text = content[cur : cur + last_sep + len(sep)]
                        break
        if len(chunk_text.strip()) >= min_chunk_size:
            out.append(
                (
                    len(out),
                    cur,
                    cur + len(chunk_text),
                    chunk_text.strip(),
                    hashlib.md5(chunk_text.encode()).hexdigest()[:8],
                )
            )
        if chunk_end < n:
            cur = cur + len(chunk_text) - chunk_overlap
        else:
            break
    return out


def recursive_chunks_ref(
    docs: DataFrame,
    chunk_size: int = 1500,
    chunk_overlap: int = 200,
    min_chunk_size: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus form of :func:`recursive_chunk_text` — per-document
    sequential logic via mapInPandas (Arrow batches; each task holds
    one batch of documents, nothing global). The walk advances at
    least ``int(0.8*chunk_size) - overlap`` chars per step, so work
    per document is linear in its length."""
    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_index int, location_start long, "
        "location_end long, chunk_text string, chunk_id string"
    )
    cs, ov, mn = int(chunk_size), int(chunk_overlap), int(min_chunk_size)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                for idx, start, end, txt, cid in recursive_chunk_text(
                    text or "", cs, ov, mn
                ):
                    rows.append((did, idx, start, end, txt, cid))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "chunk_index", "location_start",
                    "location_end", "chunk_text", "chunk_id",
                ],
            )

    # NO spread here (r11): the greedy cursor walk is linear and cheap
    # per doc — interleaved A/B (min-of-4) showed the guard's exchange
    # a net loss on its only caller (chunk_recursive_ref 0.59→0.48 s
    # with the spread removed). The merge-DP chunker keeps its spread
    # (chunking.chunk_recursive_dp — the measured 4.9× r10 win).
    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
