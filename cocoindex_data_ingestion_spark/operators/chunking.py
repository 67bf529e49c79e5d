"""Text chunkers: fixed, sentence, recursive, two-tier.

Reference behavior:
- fixed size/overlap char windows (app/processors/chunker.py:92-112)
- sentence packing w/ 1-sentence overlap (chunker.py:114-155)
- recursive paragraph→sentence fallback (chunker.py:157-220)
- two-tier page-parents + semantic children with deterministic
  md5-derived chunk ids (app/processors/two_tier_chunker.py:292-388)
- engine ``SplitRecursively`` contract: every chunk's [start, end)
  range reproduces its text from the original; chunks cover the doc
  in order; sizes respect chunk_size/min/overlap
  (src/ops/functions/split_recursively.rs:986-1026, tests :1049-1071)

Spark-first: the *fixed* chunker is a pure expression
(sequence → explode → substring) — no Python at all, so it runs at
scan speed on 100 TB. Sentence/recursive chunkers split on regex
JVM-side and pack in a pandas UDF (packing is inherently sequential
per document but documents are independent → perfectly parallel).
Chunk ids are deterministic md5(parent, index) like the reference,
so re-runs are idempotent (stable-UUID reuse semantics,
src/execution/memoization.rs:213-233).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.parallel import spread_python_stage

DEFAULT_CHUNK_SIZE = 500  # app/processors/chunker.py:14
DEFAULT_OVERLAP = 50  # app/processors/chunker.py:15

SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+"
PARAGRAPH_SPLIT_RE = r"\n\s*\n"


def fixed_chunks(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_text: bool = False,
) -> DataFrame:
    """Fixed char windows, stride = chunk_size − overlap.

    Pure Column pipeline: no UDF, no shuffle; each output chunk row
    carries Range-key semantics (location_start/location_end,
    src/base/schema.rs:39) and reproduces substring(text, start, len).
    ``keep_text`` keeps the parent document text in-row (for
    context-window consumers, avoiding a re-join to the corpus).
    """
    stride = chunk_size - overlap
    assert stride > 0
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(text_col) - 1, F.lit(0)),
        F.lit(stride),
    )
    out = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(starts).alias("chunk_index", "location_start"),
    )
    cols = [
        F.col(id_col),
        F.col("chunk_index"),
        F.col("location_start"),
        F.least(F.col("location_start") + chunk_size, F.length(text_col)).alias(
            "location_end"
        ),
        F.substring(F.col(text_col), F.col("location_start") + 1, chunk_size).alias(
            "chunk_text"
        ),
    ]
    if keep_text:
        cols.append(F.col(text_col))
    return out.select(*cols)


def _pack_sentences(
    sentences: list[tuple[str, int]], chunk_size: int, text: str
) -> list[tuple[int, int, int, str]]:
    """Pack (sentence, start_offset) into chunks ≤ chunk_size chars
    with 1-sentence overlap (reference chunker.py:114-155).
    Returns (chunk_index, start, end, text).

    Range contract: every chunk's [start, end) is measured in the
    ORIGINAL text and chunk_text IS text[start:end] — offsets stay
    correct whatever the inter-sentence separators were ('\\n\\n',
    runs of spaces, ...), so downstream consumers (two-tier parent
    offsets, mention realignment) can trust them verbatim."""
    chunks: list[tuple[int, int, int, str]] = []
    cur: list[tuple[str, int]] = []

    def emit() -> None:
        start = cur[0][1]
        end = cur[-1][1] + len(cur[-1][0])
        chunks.append((len(chunks), start, end, text[start:end]))

    for sent, off in sentences:
        if cur and (off + len(sent) - cur[0][1]) > chunk_size:
            emit()
            cur = [cur[-1]]  # 1-sentence overlap
        cur.append((sent, off))
    if cur:
        emit()
    return chunks


def sentence_chunks(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sentence-packed chunks via mapInPandas (Arrow batches).

    Sentence split + packing is per-document sequential logic; the
    DataFrame contract (explode-like fan-out, deterministic ids)
    keeps it a normal operator in the plan."""
    import re

    sent_re = re.compile(SENTENCE_SPLIT_RE)
    # id passes through with its source type (long doc ids, string
    # parent-chunk md5 ids, ...)
    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_index int, location_start long, "
        "location_end long, chunk_text string, chunk_id string"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                sents: list[tuple[str, int]] = []
                pos = 0
                for piece in sent_re.split(text):
                    idx = text.find(piece, pos)
                    if piece.strip():
                        sents.append((piece, idx))
                    pos = idx + len(piece)
                for ci, start, end, ctext in _pack_sentences(
                    sents, chunk_size, text
                ):
                    cid = hashlib.md5(f"{did}:{ci}:{start}".encode()).hexdigest()
                    rows.append((did, ci, start, end, ctext, cid))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "chunk_index", "location_start", "location_end",
                    "chunk_text", "chunk_id",
                ],
            )

    # NO spread here (r11): the sentence regex split is trivial-Python
    # per row — the guard's exchange cost exceeded the parallelism win
    # on every caller (interleaved A/B, min-of-4: chunk_sentence
    # 0.50→0.32 s, chunk_sentence_punct 1.07→0.68 s with the spread
    # removed). Same per-site evidence rule that excluded
    # dedup_minhash_fast in r10; at real scale the guard was a no-op
    # on this path anyway (multi-split inputs).
    return docs.select(id_col, text_col).mapInPandas(run, schema)


def recursive_chunks(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    min_chunk_size: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recursive split: paragraphs first; any paragraph over
    chunk_size falls back to sentence packing; adjacent small pieces
    merge up to chunk_size (SplitRecursively's size contract —
    cost-model simplified per SURVEY §7 'what's hard')."""
    import re

    para_re = re.compile(PARAGRAPH_SPLIT_RE)
    sent_re = re.compile(SENTENCE_SPLIT_RE)
    schema = (
        f"{id_col} long, chunk_index int, location_start long, "
        "location_end long, chunk_text string"
    )

    def split_doc(text: str) -> list[tuple[int, int]]:
        """Return [start, end) spans ≤ chunk_size covering the text."""
        spans: list[tuple[int, int]] = []
        pos = 0
        for para in para_re.split(text):
            pstart = text.find(para, pos)
            pos = pstart + len(para)
            if not para.strip():
                continue
            if len(para) <= chunk_size:
                spans.append((pstart, pstart + len(para)))
                continue
            spos = 0
            for sent in sent_re.split(para):
                sstart = para.find(sent, spos)
                spos = sstart + len(sent)
                if not sent.strip():
                    continue
                for off in range(0, len(sent), chunk_size):
                    spans.append(
                        (pstart + sstart + off,
                         pstart + sstart + min(off + chunk_size, len(sent)))
                    )
        # merge adjacent small spans
        merged: list[tuple[int, int]] = []
        for s, e in spans:
            if merged and (e - merged[-1][0]) <= chunk_size and (
                merged[-1][1] >= s - 2  # adjacency across separators
            ):
                if (merged[-1][1] - merged[-1][0]) < min_chunk_size or (
                    e - s
                ) < min_chunk_size:
                    merged[-1] = (merged[-1][0], e)
                    continue
            merged.append((s, e))
        return merged

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                for ci, (s, e) in enumerate(split_doc(text)):
                    rows.append((did, ci, s, e, text[s:e]))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_index", "location_start", "location_end",
                         "chunk_text"],
            )

    return spread_python_stage(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema)


def semantic_chunks(
    docs: DataFrame,
    boundary_threshold: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Semantic chunking (app/processors/semantic_chunker.py:15-143):
    sentence embeddings; a boundary opens where consecutive-sentence
    cosine < threshold; short chunks merge forward; token bounds
    enforced.

    Embedder: the engine's deterministic hash embedder (SURVEY §7 —
    real models plug into the same per-batch shape). Per-document
    sequential logic → mapInPandas over Arrow batches; docs are
    independent so this parallelizes like any map."""
    import re

    import numpy as np

    from cocoindex_data_ingestion_spark.operators.embedding import (
        hash_embed_series,
    )

    sent_re = re.compile(SENTENCE_SPLIT_RE)
    schema = (
        f"{id_col} long, chunk_index int, location_start long, "
        "location_end long, chunk_text string, n_sentences int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                text = text or ""
                sents: list[tuple[str, int]] = []
                pos = 0
                for piece in sent_re.split(text):
                    idx = text.find(piece, pos)
                    if piece.strip():
                        sents.append((piece, idx))
                    pos = idx + len(piece)
                if not sents:
                    continue
                embs = hash_embed_series(
                    pd.Series([s for s, _ in sents]), dim=32
                ).tolist()
                groups: list[list[int]] = [[0]]
                for i in range(1, len(sents)):
                    a, b = np.array(embs[i - 1]), np.array(embs[i])
                    denom = float(np.linalg.norm(a) * np.linalg.norm(b))
                    cos = float(a @ b) / denom if denom > 0 else 0.0
                    cur_tokens = sum(
                        len(sents[j][0].split()) for j in groups[-1]
                    )
                    if cos < boundary_threshold or cur_tokens >= max_tokens:
                        groups.append([i])
                    else:
                        groups[-1].append(i)
                # merge short chunks forward (reference merges when
                # cross-similarity is high; deterministic variant:
                # merge any under-min chunk into its successor)
                merged: list[list[int]] = []
                for g in groups:
                    toks = sum(len(sents[j][0].split()) for j in g)
                    if merged and sum(
                        len(sents[j][0].split()) for j in merged[-1]
                    ) < min_tokens:
                        merged[-1].extend(g)
                    else:
                        merged.append(g)
                for ci, g in enumerate(merged):
                    start = sents[g[0]][1]
                    end = sents[g[-1]][1] + len(sents[g[-1]][0])
                    rows.append(
                        (did, ci, start, end, text[start:end], len(g))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_index", "location_start",
                         "location_end", "chunk_text", "n_sentences"],
            )

    return spread_python_stage(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema)


def semantic_chunks_ref(
    docs: DataFrame,
    similarity_threshold: float = 0.5,
    min_chunk_size: int = 50,
    max_chunk_size: int = 200,
    maintain_context: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Faithful port of the reference's TRUE semantic chunker
    (app/processors/semantic_chunker.py:15-263) — richer than
    :func:`semantic_chunks` (which keeps only the boundary rule with
    a simplified merge):

    1. abbreviation-protected sentence split (:48-60);
    2. full pairwise sentence-similarity matrix (:62-78; embedder =
       the engine's deterministic hash double, dim 32 — real
       SentenceTransformers plug into the same per-batch shape);
    3. boundaries where consecutive similarity < threshold (:80-103);
    4. short chunks (< min_chunk_size whitespace tokens) merge with
       the NEXT chunk only when the average cross-chunk similarity
       ≥ 0.8·threshold, consuming it (i += 2) — merged chunks are
       never re-gated, and gates always compare ORIGINAL chunk spans
       (:105-141);
    5. chunks over max_chunk_size tokens split greedily at sentence
       boundaries (:239-263);
    6. metadata: sentence/token counts, semantic_focus = first 100
       chars of the most representative sentence (argmax mean
       within-chunk similarity, first-max tie-break), and ±200-char
       previous/next context when maintain_context (:195-236).

    Per-document sequential logic → mapInPandas. Similarities drive
    DECISIONS only (boundary, merge gate, focus argmax); the oracle
    corpus asserts margins so float summation order cannot flip
    them."""
    import numpy as np

    from cocoindex_data_ingestion_spark.operators.embedding import (
        hash_embed_series,
    )

    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_index int, chunk_text string, "
        "sentence_count int, token_count int, semantic_focus string, "
        "total_chunks int, previous_context string, next_context string"
    )
    thr, min_sz, max_sz = (
        float(similarity_threshold), int(min_chunk_size), int(max_chunk_size),
    )
    ctx = bool(maintain_context)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sents = split_into_sentences_ref(text or "")
                if not sents:
                    continue
                embs = np.array(
                    hash_embed_series(pd.Series(sents), dim=32).tolist()
                )
                norms = np.sqrt((embs * embs).sum(axis=1))
                norms[norms == 0] = 1.0
                unit = embs / norms[:, None]
                sim = unit @ unit.T
                # boundaries (semantic_chunker.py:80-103)
                boundaries = [
                    i + 1
                    for i in range(len(sents) - 1)
                    if sim[i, i + 1] < thr
                ]
                chunks: list[list[str]] = []
                spans: list[tuple[int, int]] = []
                start = 0
                for b in boundaries:
                    chunks.append(sents[start:b])
                    spans.append((start, b))
                    start = b
                if start < len(sents):
                    chunks.append(sents[start:])
                    spans.append((start, len(sents)))
                # merge short chunks (:105-141)
                merged: list[list[str]] = []
                mspans: list[tuple[int, int]] = []
                i = 0
                while i < len(chunks):
                    cur = chunks[i]
                    cur_size = sum(len(s.split()) for s in cur)
                    if cur_size < min_sz and i < len(chunks) - 1:
                        (cs, ce), (ns, ne) = spans[i], spans[i + 1]
                        if float(np.mean(sim[cs:ce, ns:ne])) >= thr * 0.8:
                            merged.append(cur + chunks[i + 1])
                            mspans.append((cs, ne))
                            i += 2
                            continue
                    merged.append(cur)
                    mspans.append(spans[i])
                    i += 1
                # split large chunks (:239-263)
                final: list[tuple[int, int]] = []  # sentence spans
                for (ms, me) in mspans:
                    toks = [len(sents[j].split()) for j in range(ms, me)]
                    if sum(toks) > max_sz:
                        cur_start, cur_size = ms, 0
                        for j in range(ms, me):
                            if cur_size + toks[j - ms] > max_sz and (
                                j > cur_start
                            ):
                                final.append((cur_start, j))
                                cur_start, cur_size = j, toks[j - ms]
                            else:
                                cur_size += toks[j - ms]
                        final.append((cur_start, me))
                    else:
                        final.append((ms, me))
                n_chunks = len(final)
                texts = [" ".join(sents[a:b]) for a, b in final]
                for ci, (a, b) in enumerate(final):
                    # semantic focus (:206-216): most representative
                    # sentence = argmax mean within-chunk similarity.
                    # Determinism hardening vs the reference: the raw
                    # argmax is a structural ulp-tie for 2-sentence
                    # chunks (both row means = (self + s01)/2), so the
                    # key is quantized at 1e-9 and ties break on the
                    # FIRST sentence — same rule as np.argmax on exact
                    # ties, now engine-independent.
                    if b - a > 1:
                        sub = sim[a:b, a:b]
                        key = np.floor(
                            sub.mean(axis=1) * 1e9 + 0.5
                        ).astype(np.int64)
                        rep = int(np.argmax(key))
                        focus = sents[a + rep][:100]
                    else:
                        focus = sents[a][:100]
                    prev_ctx = (
                        texts[ci - 1][-200:]
                        if ctx and n_chunks > 1 and ci > 0 else None
                    )
                    next_ctx = (
                        texts[ci + 1][:200]
                        if ctx and n_chunks > 1 and ci < n_chunks - 1
                        else None
                    )
                    rows.append(
                        (did, ci, texts[ci], b - a,
                         len(texts[ci].split()), focus, n_chunks,
                         prev_ctx, next_ctx)
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_index", "chunk_text",
                         "sentence_count", "token_count", "semantic_focus",
                         "total_chunks", "previous_context", "next_context"],
            )

    return spread_python_stage(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema)


def chunk_recursive_dp(
    docs: DataFrame,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    min_chunk_size: int | None = None,
    chunk_overlap: int = 0,
    separators: tuple[str, ...] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    language: str | None = None,
    language_col: str | None = None,
    custom_languages: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """The reference SplitRecursively (cost-model merge DP over
    separator-stack atoms, functions/split_recursively.py — faithful
    port of split_recursively.rs:27-30,597-743) as a Spark operator.

    Per-document sequential DP → mapInPandas (documents independent,
    perfectly parallel; no shuffle).

    Language dispatch mirrors the reference op args
    (split_recursively.rs:32-38,770-830): ``language`` (name, alias, or
    file extension; case-insensitive) picks a per-language separator
    stack, ``language_col`` resolves it per row (a mixed-language
    corpus in one pass — resolution is a dict lookup, so per-row cost
    is nil), ``custom_languages`` adds spec-level stacks that take
    precedence, explicit ``separators`` overrides everything, and
    unknown languages fall back to the default stack."""
    from cocoindex_data_ingestion_spark.functions.split_recursively import (
        RecursiveChunker, resolve_separators,
    )

    fixed_seps = (
        tuple(separators)
        if separators
        else (resolve_separators(language, custom_languages)
              if language_col is None else None)
    )
    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_index int, location_start long, "
        "location_end long, chunk_text string"
    )
    in_cols = [id_col, text_col] + ([language_col] if language_col else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            langs = (
                pdf[language_col]
                if language_col and fixed_seps is None
                else [None] * len(pdf)
            )
            for did, text, lang in zip(pdf[id_col], pdf[text_col], langs):
                seps = (
                    fixed_seps
                    if fixed_seps is not None
                    else resolve_separators(lang, custom_languages)
                )
                chunker = RecursiveChunker(
                    text or "", chunk_size, min_chunk_size, chunk_overlap,
                    seps,
                )
                for ci, (s, e, ctext) in enumerate(chunker.split()):
                    rows.append((did, ci, s, e, ctext))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_index", "location_start",
                         "location_end", "chunk_text"],
            )

    return spread_python_stage(
        docs.select(*in_cols), id_col
    ).mapInPandas(run, schema)


REF_ABBREV_RES = (
    r"\b(Mr|Mrs|Ms|Dr|Prof|Sr|Jr)\.\s*",
    r"\b(Inc|Ltd|Corp|Co)\.\s*",
    r"\b(etc|vs|i\.e|e\.g)\.\s*",
    r"\b([A-Z])\.\s*",
)
REF_SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+(?=[A-Z])"
HEADING_RE = r"^(#{1,6})\s+.*$"


def split_into_sentences_ref(text: str) -> list[str]:
    """The reference's improved sentence splitter
    (two_tier_chunker.py:78-93): protect common abbreviations with a
    <DOT> marker, split on terminator + whitespace + UPPERCASE
    lookahead, restore dots, strip."""
    import re

    for pat in REF_ABBREV_RES:
        text = re.sub(pat, r"\1<DOT> ", text)
    pieces = re.split(REF_SENTENCE_SPLIT_RE, text)
    return [p.replace("<DOT>", ".").strip() for p in pieces if p.strip()]


def split_heading_blocks(text: str) -> list[tuple[str | None, str]]:
    """Markdown heading blocks (two_tier_chunker.py:96-132): headings
    are hard boundaries; (heading_line, body) per block; text before
    the first heading merges into the first block's body so the
    preamble stays attached; no headings → one (None, text) block."""
    import re

    pattern = re.compile(HEADING_RE, re.MULTILINE)
    matches = list(pattern.finditer(text))
    if not matches:
        return [(None, text.strip())] if text.strip() else []
    blocks: list[tuple[str | None, str]] = []
    preamble = text[: matches[0].start()].strip()
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i < len(matches) - 1 else len(text)
        block_text = text[m.start():end].strip()
        lines = block_text.splitlines()
        heading_line = lines[0].strip() if lines else None
        body = "\n".join(lines[1:]).strip() if len(lines) > 1 else ""
        if i == 0 and preamble:
            body = preamble + ("\n\n" + body if body else "")
        blocks.append((heading_line, body))
    return blocks


def heading_aware_chunks(
    docs: DataFrame,
    max_sentences: int = 3,
    max_tokens: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heading-aware semantic-tier chunking — the reference's
    deterministic path (two_tier_chunker.py:134-215): heading blocks
    chunk independently (content from different sections never
    mixes), sentences pack greedily under BOTH a sentence cap
    (semantic_max_sentences=3) and a token cap
    (semantic_max_tokens=100), the heading line prefixes the FIRST
    chunk of its block (``heading\\n\\nchunk``), and a heading with an
    empty body is kept as its own chunk.

    Token counts use whitespace-token counts as the deterministic
    stand-in for the reference's tiktoken cl100k_base
    (two_tier_chunker.py:65-67 — no tokenizer models in env; the
    trained-BPE operators cover subword behavior separately).

    Per-document sequential logic → mapInPandas; documents are
    independent, so this parallelizes like any map. Returns
    (id, chunk_index, heading, chunk_text, sentence_count,
    token_count) with chunk_index global per document in block
    order."""
    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_index int, heading string, "
        "chunk_text string, sentence_count int, token_count int"
    )
    max_s, max_t = int(max_sentences), int(max_tokens)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ci = 0

                def emit(heading, chunk_sents, first):
                    nonlocal ci
                    chunk_text = " ".join(chunk_sents)
                    if first and heading:
                        chunk_text = (
                            f"{heading}\n\n{chunk_text}" if chunk_text
                            else heading
                        )
                    rows.append(
                        (did, ci, heading, chunk_text, len(chunk_sents),
                         len(chunk_text.split()))
                    )
                    ci += 1

                for heading, body in split_heading_blocks(text or ""):
                    sents = split_into_sentences_ref(body) if body else []
                    cur: list[str] = []
                    cur_tok = 0
                    first = True
                    for s in sents:
                        s_tok = len(s.split())
                        if cur and (
                            len(cur) >= max_s or cur_tok + s_tok > max_t
                        ):
                            emit(heading, cur, first)
                            first = False
                            cur, cur_tok = [], 0
                        cur.append(s)
                        cur_tok += s_tok
                    if cur or heading:
                        emit(heading, cur, first)
            yield pd.DataFrame(
                rows,
                columns=[id_col, "chunk_index", "heading", "chunk_text",
                         "sentence_count", "token_count"],
            )

    return spread_python_stage(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, schema)


def context_prompt(level_col, chunk_col, ctx_col, title_col) -> F.Column:
    """The reference's contextual-summary prompts, verbatim
    (two_tier_chunker.py:321-352): semantic chunks get the document
    title + the parent context truncated to 200 chars + the chunk;
    parent chunks get the title + the chunk truncated to 600 chars.
    Pure Column concat — the prompt construction is engine logic, the
    LLM call behind it is the external seam."""
    level = F.col(level_col) if isinstance(level_col, str) else level_col
    chunk = F.col(chunk_col) if isinstance(chunk_col, str) else chunk_col
    ctx = F.col(ctx_col) if isinstance(ctx_col, str) else ctx_col
    title = F.col(title_col) if isinstance(title_col, str) else title_col
    semantic = F.concat(
        F.lit("Document: "), title,
        F.lit("\n\nContext: "), F.substring(ctx, 1, 200),
        F.lit("\n\nSentence(s): "), chunk,
        F.lit("\n\nWrite a single sentence that explains the specific "
              "fact or concept in this text. Be precise and factual."),
    )
    parent = F.concat(
        F.lit("Document: "), title,
        F.lit("\n\nParent Content Summary: "), F.substring(chunk, 1, 600),
        F.lit("\n\nWrite 2-3 sentences summarizing the key topics and "
              "themes covered in this part of the document."),
    )
    return F.when(level == "semantic", semantic).otherwise(parent)


def default_summary_column(prompt_col, chunk_col) -> F.Column:
    """Deterministic LLM double for contextual summaries: a stable
    8-hex tag of the EXACT prompt (so any drift in prompt
    construction changes the output and fails the oracle) + the
    chunk's first 12 whitespace tokens. Pure expression; the real
    service swaps in a pandas-UDF LLM call with the same signature."""
    prompt = F.col(prompt_col) if isinstance(prompt_col, str) else prompt_col
    chunk = F.col(chunk_col) if isinstance(chunk_col, str) else chunk_col
    return F.concat(
        F.substring(F.md5(prompt), 1, 8),
        F.lit(": "),
        F.array_join(F.slice(F.split(chunk, " "), 1, 12), " "),
    )


def contextualize_chunks(
    chunks: DataFrame,
    level_col: str = "chunk_level",
    chunk_col: str = "chunk_text",
    ctx_col: str = "parent_context",
    title_col: str = "doc_title",
    summarize=None,
) -> DataFrame:
    """Anthropic-style contextual retrieval, the reference's two-tier
    enrichment step (two_tier_chunker.py:405-485): per chunk, an LLM
    summary prompted per level → ``contextualized_text`` =
    ``summary\\n\\nchunk_text`` → BM25 tokens computed over the
    CONTEXTUALIZED text (that re-tokenization is the point — the
    summary's terms become searchable). ``summarize(prompt_col,
    chunk_col) -> Column`` plugs the real LLM; default is the
    deterministic double. Adds (contextual_summary,
    contextualized_text, bm25_tokens)."""
    from cocoindex_data_ingestion_spark.functions.text import bm25_tokens

    fn = summarize or default_summary_column
    prompt = context_prompt(level_col, chunk_col, ctx_col, title_col)
    out = chunks.withColumn(
        "contextual_summary", fn(prompt, F.col(chunk_col))
    ).withColumn(
        "contextualized_text",
        F.concat(F.col("contextual_summary"), F.lit("\n\n"),
                 F.col(chunk_col)),
    )
    return out.withColumn(
        "bm25_tokens", bm25_tokens("contextualized_text")
    )


def two_tier_pages(
    docs: DataFrame,
    page_size: int = 1200,
    page_overlap: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The parent tier of the two-tier chunker: page-level fixed
    windows with deterministic md5 parent ids
    (two_tier_chunker.py:292-330). Exposed separately so retrieval
    can join child hits back to parent context (small-to-big)."""
    return fixed_chunks(
        docs, chunk_size=page_size, overlap=page_overlap, id_col=id_col,
        text_col=text_col,
    ).select(
        F.col(id_col),
        F.md5(F.concat_ws(":", F.col(id_col), F.lit("page"), F.col("chunk_index")))
        .alias("parent_chunk_id"),
        F.col("chunk_index").alias("parent_index"),
        F.col("location_start").alias("parent_start"),
        F.col("chunk_text").alias("parent_text"),
    )


def two_tier_chunks(
    docs: DataFrame,
    page_size: int = 1200,
    page_overlap: int = 200,
    child_size: int = 300,
    id_col: str = "doc_id",
    text_col: str = "text",
    child_mode: str = "sentence",
) -> DataFrame:
    """Two-tier chunking (two_tier_chunker.py:292-388): page-level
    parents (fixed windows) + semantic children per parent,
    deterministic md5 ids, BM25 tokens precomputed per child.

    ``child_mode`` selects the child splitter: ``"sentence"`` is the
    reference's sentence-packed tier; ``"fixed"`` emits fixed
    ``child_size`` windows (stride = size, no overlap) — the fully
    expression-level variant (no UDF at all), and the one whose
    output is closed-form SQL-expressible for the correctness oracle
    (on a corpus without sentence punctuation, sentence packing
    degenerates to one whole-page child, which would make
    small-to-big vacuous).

    Two-stage explode; both stages shuffle-free (fan-out only)."""
    from cocoindex_data_ingestion_spark.functions.text import bm25_tokens

    pages = two_tier_pages(
        docs, page_size=page_size, page_overlap=page_overlap,
        id_col=id_col, text_col=text_col,
    )
    # children keyed DIRECTLY by the md5 parent_chunk_id string —
    # sentence_chunks passes any id type through, so no lossy
    # hash-to-long round trip (a 63-bit collision would silently
    # mis-parent a chunk at corpus scale)
    if child_mode == "fixed":
        children = fixed_chunks(
            pages.select("parent_chunk_id", F.col("parent_text").alias(text_col)),
            chunk_size=child_size, overlap=0, id_col="parent_chunk_id",
            text_col=text_col,
        )
    else:
        children = sentence_chunks(
            pages.select("parent_chunk_id", F.col("parent_text").alias(text_col)),
            chunk_size=child_size, id_col="parent_chunk_id", text_col=text_col,
        )
    key = pages.select(
        "parent_chunk_id", F.col(id_col), "parent_index", "parent_start"
    )
    return (
        children
        .join(F.broadcast(key), "parent_chunk_id")
        .select(
            F.col(id_col).alias("document_id"),
            "parent_chunk_id",
            F.lit("semantic").alias("chunk_level"),
            "chunk_index",
            (F.col("parent_start") + F.col("location_start")).alias("location_start"),
            (F.col("parent_start") + F.col("location_end")).alias("location_end"),
            "chunk_text",
            F.md5(F.concat_ws(":", "parent_chunk_id", "chunk_index")).alias("chunk_id"),
            bm25_tokens("chunk_text").alias("bm25_tokens"),
            F.size(bm25_tokens("chunk_text")).alias("chunk_size"),
        )
    )


def merge_dp_over_atoms(
    atoms: DataFrame,
    docs: DataFrame,
    chunk_size: int,
    min_chunk_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sentinel_syntax_level: int = 0,
) -> DataFrame:
    """The SplitRecursively merge DP (split_recursively.rs:597-743)
    exposed over a CALLER-SUPPLIED atom table — the DP-only surface,
    so the cost model itself gets a cross-engine oracle while the
    regex atomizer stays pytest-pinned (its recursion produces the
    same ``_Atom`` rows).

    ``atoms``: (id, idx, start, end, boundary_syntax_level,
    internal_lb_level, boundary_lb_level); the terminal sentinel atom
    (AtomChunksCollector.finish, split_recursively.py:246-251) is
    appended here with the given syntax level. Overlap = 0 (the
    heap-admissibility path is exercised in test_split_dp).

    Per-document sequential DP. Execution shape: atoms pack into one
    per-document struct array (a single grouped pass), join the text
    co-partitioned on the id, then ``mapInPandas`` folds WHOLE Arrow
    batches of documents per Python call — one interpreter entry per
    ~10k documents instead of one per document (the cogrouped
    per-key form measured ~3.6 ms/doc of pure invocation overhead at
    sf0.1). Documents stay independent; state never exceeds one
    document's atom list.
    """
    from typing import Iterator

    from cocoindex_data_ingestion_spark.functions.split_recursively import (
        DOUBLE_NEWLINE, INLINE, RecursiveChunker, _Atom,
    )

    id_type = dict(docs.dtypes)[id_col]
    schema = (
        f"{id_col} {id_type}, chunk_index int, location_start long, "
        "location_end long, chunk_text string"
    )
    cs, mn, ssl = chunk_size, min_chunk_size, sentinel_syntax_level
    cols = [
        id_col, "chunk_index", "location_start", "location_end",
        "chunk_text",
    ]

    packed = atoms.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "idx", "start", "end", "boundary_syntax_level",
                    "internal_lb_level", "boundary_lb_level",
                )
            )
        ).alias("_atoms")
    )
    joined = packed.join(docs.select(id_col, text_col), id_col)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for did, alist_raw, text in zip(
                pdf[id_col], pdf["_atoms"], pdf[text_col]
            ):
                text = text or ""
                alist = [
                    _Atom(
                        int(a["start"]), int(a["end"]),
                        int(a["boundary_syntax_level"]),
                        int(a["internal_lb_level"]),
                        int(a["boundary_lb_level"]),
                    )
                    for a in alist_raw
                ]
                alist.append(
                    _Atom(len(text), len(text), ssl, INLINE, DOUBLE_NEWLINE)
                )
                chunker = RecursiveChunker(text, cs, mn, 0)
                rows.extend(
                    (did, i, s, e, txt)
                    for i, (s, e, txt) in enumerate(chunker._merge(alist))
                )
            yield pd.DataFrame(rows, columns=cols)

    return spread_python_stage(joined, id_col).mapInPandas(run, schema)
