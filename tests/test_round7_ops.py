"""Round-7 regression guards.

1. ``small_to_big`` join strategy: both corpus-sized tables (children
   mapping, parents tier) must be probed via BroadcastHashJoin with the
   bounded frame broadcast — hinted in the operator, NOT dependent on
   AQE or size estimation (VERDICT r6 directive #6).
2. Punctuated-corpus chunker fixtures: the non-degenerate sentence
   packing path gets a cross-engine oracle this round; these tests pin
   the Spark side of that contract (VERDICT r6 directive #2).
"""

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("round7-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_punct_corpus_preconditions():
    """The punctuated micro-corpus must satisfy the invariants under
    which the Python regex (?<=[.!?])\\s+ and the oracle's
    replace-split agree: every whitespace char is a single space, no
    space runs, no apostrophes (SQL literal safety), no leading or
    trailing whitespace."""
    import re

    from __spark_entry__ import _PUNCT_CORPUS

    for _d, text in _PUNCT_CORPUS:
        assert "'" not in text
        assert not re.search(r"[^\S ]", text), "only plain spaces allowed"
        assert "  " not in text, "no multi-space runs"
        assert text == text.strip()


def test_punct_oracle_is_non_degenerate(spark):
    """The whole point of the punct fixtures (r6 directive #2): the
    cross-engine check must exercise REAL packing — multi-chunk docs,
    multi-sentence chunks, and the 1-sentence overlap carry — not the
    one-chunk-per-doc identity the sf corpus degenerates to."""
    import __spark_entry__ as entrymod

    rows = entrymod._q_chunk_sentence_punct(spark, "").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # multiple docs emit >1 chunk
    multi = [d for d, rs in by_doc.items() if len(rs) > 1]
    assert len(multi) >= 3, by_doc.keys()
    # chunks overlap: within a doc, next chunk starts BEFORE previous
    # ends (the shared overlap sentence)
    overlaps = 0
    for d in multi:
        rs = sorted(by_doc[d], key=lambda r: r.chunk_index)
        for a, b in zip(rs, rs[1:]):
            assert b.location_start < a.location_end, (d, a, b)
            overlaps += 1
    assert overlaps >= 5
    # at least one chunk holds >1 sentence (contains a terminator
    # followed by a space INSIDE the chunk text)
    import re

    assert any(re.search(r"[.!?] ", r.chunk_text) for r in rows)
    # the oversized single sentence (doc 3) stays whole
    doc3 = sorted(by_doc[3], key=lambda r: r.chunk_index)
    assert any(len(r.chunk_text) > 48 for r in doc3)

    # two-tier: several pages emit >1 child
    tt = entrymod._q_chunk_two_tier_punct(spark, "").collect()
    per_page: dict = {}
    for r in tt:
        per_page.setdefault(r.parent_chunk_id, []).append(r)
    assert sum(1 for rs in per_page.values() if len(rs) > 1) >= 4
    # children re-base to document coordinates: every child text is a
    # literal slice of its original document
    docs = dict(entrymod._PUNCT_CORPUS)
    for r in tt:
        assert (
            docs[r.document_id][r.location_start:r.location_end]
            == r.chunk_text
        ), r


def test_punct_semantic_margins_and_branches():
    """chunk_semantic_punct's oracle compares boundary DECISIONS, not
    floats — safe only if no consecutive-sentence cosine sits near the
    0.5 threshold (where np-vs-DuckDB summation order could flip it),
    and meaningful only if BOTH branches fire (some pair >= 0.5 keeps
    a group together, some pair < 0.5 opens a boundary). Also pins
    that the max_tokens cap is non-triggering on this corpus (the cap
    branch stays covered by test_chunking)."""
    import re

    import numpy as np
    import pandas as pd

    from __spark_entry__ import (
        _PUNCT_CORPUS, _SEM_MAX_TOK, _SEM_THRESH,
    )
    from cocoindex_data_ingestion_spark.operators.chunking import (
        SENTENCE_SPLIT_RE,
    )
    from cocoindex_data_ingestion_spark.operators.embedding import (
        hash_embed_series,
    )

    sent_re = re.compile(SENTENCE_SPLIT_RE)
    above = below = 0
    for _d, text in _PUNCT_CORPUS:
        sents = [p for p in sent_re.split(text) if p.strip()]
        assert sum(len(s.split()) for s in sents) < _SEM_MAX_TOK
        embs = hash_embed_series(pd.Series(sents), dim=32).tolist()
        for a, b in zip(embs, embs[1:]):
            a, b = np.array(a), np.array(b)
            cos = float(a @ b) / float(np.linalg.norm(a) * np.linalg.norm(b))
            assert abs(cos - _SEM_THRESH) > 1e-3, cos
            if cos >= _SEM_THRESH:
                above += 1
            else:
                below += 1
    assert above >= 1, "no same-group pair: boundary rule untested"
    assert below >= 5, "no boundaries: grouping untested"


def test_punct_semantic_is_non_degenerate(spark):
    """The semantic punct fixture must produce multi-chunk docs AND a
    multi-sentence chunk from the cosine rule itself (doc 7's
    near-duplicate consecutive sentences), plus merge-forward joins
    (chunks whose sentences span a sub-min_tokens group)."""
    import __spark_entry__ as entrymod

    rows = entrymod._q_chunk_semantic_punct(spark, "").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sum(1 for rs in by_doc.values() if len(rs) > 1) >= 3
    assert any(r.n_sentences > 1 for r in by_doc[7])
    # chunk text is a literal document slice at document coordinates
    docs = dict(entrymod._PUNCT_CORPUS)
    for r in rows:
        assert docs[r.doc_id][r.location_start:r.location_end] == r.chunk_text


def test_md_corpus_preconditions():
    """Invariants under which the reference sentence splitter
    ((?<=[.!?])\\s+(?=[A-Z]) with abbreviation protection) and the
    oracle's replace-split agree on the markdown micro-corpus: no
    protected abbreviations, every terminator+space boundary followed
    by uppercase, single-line bodies/preamble ending in a terminator,
    no apostrophes/tabs/double spaces."""
    import re

    from __spark_entry__ import _MD_CORPUS

    abbrev = re.compile(
        r"\b(Mr|Mrs|Ms|Dr|Prof|Sr|Jr|Inc|Ltd|Corp|Co|etc|vs|i\.e|e\.g"
        r"|[A-Z])\."
    )
    for _d, text in _MD_CORPUS:
        assert "'" not in text and "\t" not in text and "  " not in text
        assert not abbrev.search(text), text
        for m in re.finditer(r"[.!?][ ]", text):
            nxt = text[m.end():m.end() + 1]
            assert nxt.isupper() or nxt == "#", (text, m.start())
        for line in text.split("\n"):
            assert line == line.strip()
            if not re.match(r"^#{1,6} ", line) and line:
                assert line[-1] in ".!?", line


def test_split_into_sentences_ref_abbreviations():
    """The abbreviation-protection path of the reference splitter
    (two_tier_chunker.py:78-93) — NOT coverable by the oracle (RE2
    has no lookbehind/lookahead replace), so pinned here."""
    from cocoindex_data_ingestion_spark.operators.chunking import (
        split_into_sentences_ref,
    )

    out = split_into_sentences_ref(
        "Dr. Smith joined Acme Inc. last year. The work, e.g. parsing, "
        "was hard. Mr. B. Jones agreed. Final sentence here."
    )
    assert out == [
        "Dr. Smith joined Acme Inc. last year.",
        "The work, e.g. parsing, was hard.",
        "Mr. B. Jones agreed.",
        "Final sentence here.",
    ]
    # lowercase after terminator does NOT split
    assert split_into_sentences_ref("One thing. another thing.") == [
        "One thing. another thing."
    ]


def test_heading_aware_non_degenerate(spark):
    """The markdown fixture must exercise every branch: preamble
    merged into the first heading block, heading-only chunks,
    sentence-cap splits, token-cap splits, and the no-heading doc."""
    import __spark_entry__ as entrymod

    rows = entrymod._q_chunk_heading_aware(spark, "").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1 preamble merged: first chunk of '# Getting Started' block
    # contains the intro line AFTER the heading prefix
    d1c0 = min(by_doc[1], key=lambda r: r.chunk_index)
    assert d1c0.chunk_text.startswith("# Getting Started\n\nIntro line")
    # doc 3: heading-only blocks survive as their own chunks
    d3 = sorted(by_doc[3], key=lambda r: r.chunk_index)
    assert d3[0].chunk_text == "# Empty Section" and d3[0].sentence_count == 0
    assert d3[1].chunk_text == "## Another Empty One"
    # doc 4: 7 sentences under the 3-sentence cap -> 3 chunks (3/3/1)
    d4 = sorted(by_doc[4], key=lambda r: r.chunk_index)
    assert [r.sentence_count for r in d4] == [3, 3, 1]
    # doc 6: TOKEN cap splits two single sentences
    d6 = sorted(by_doc[6], key=lambda r: r.chunk_index)
    assert [r.sentence_count for r in d6] == [1, 1]
    assert all(r.token_count <= 100 + 3 for r in d6)  # + heading tokens
    # doc 2: no headings -> one NULL-heading block, sentences packed
    assert all(r.heading is None for r in by_doc[2])


def test_semantic_ref_margins_and_branches(spark):
    """chunk_semantic_ref compares decisions, so every decision needs
    a margin on this corpus: boundary cosines away from 0.5 (already
    pinned above), merge-gate averages away from 0.8·threshold, and
    quantized focus keys away from their rounding boundary. Also
    asserts each branch actually fires: at least one gated merge
    accepted, one rejected, and one token-cap sub-split."""
    import re

    import numpy as np
    import pandas as pd

    import __spark_entry__ as entrymod
    from cocoindex_data_ingestion_spark.operators.chunking import (
        SENTENCE_SPLIT_RE,
    )
    from cocoindex_data_ingestion_spark.operators.embedding import (
        hash_embed_series,
    )

    thr, min_sz = entrymod._SREF_THR, entrymod._SREF_MIN
    sent_re = re.compile(SENTENCE_SPLIT_RE)
    accepted = rejected = 0
    for _d, text in entrymod._PUNCT_CORPUS:
        sents = [p for p in sent_re.split(text) if p.strip()]
        if len(sents) < 2:
            continue
        embs = np.array(hash_embed_series(pd.Series(sents), dim=32).tolist())
        n = np.sqrt((embs * embs).sum(axis=1))
        n[n == 0] = 1.0
        unit = embs / n[:, None]
        sim = unit @ unit.T
        # initial chunk spans (boundary rule)
        bounds = [i + 1 for i in range(len(sents) - 1) if sim[i, i + 1] < thr]
        spans, start = [], 0
        for b in bounds + [len(sents)]:
            if start < b:
                spans.append((start, b))
            start = b
        # gate margins over ALL consecutive original pairs (superset
        # of the gates the skip-2 merge can evaluate)
        for (cs, ce), (ns, ne) in zip(spans, spans[1:]):
            avg = float(np.mean(sim[cs:ce, ns:ne]))
            assert abs(avg - thr * 0.8) > 1e-3, avg
            size = sum(len(s.split()) for s in sents[cs:ce])
            if size < min_sz:
                if avg >= thr * 0.8:
                    accepted += 1
                else:
                    rejected += 1
        # focus quantization margins: every within-span mean's scaled
        # fractional part is far from the floor(+0.5) boundary
        for (a, b) in spans:
            if b - a > 1:
                means = sim[a:b, a:b].mean(axis=1)
                frac = (means * 1e9 + 0.5) % 1.0
                assert np.min(np.minimum(frac, 1 - frac)) > 1e-4
    assert accepted >= 1, "similarity-gated merge never accepted"
    assert rejected >= 1, "similarity-gated merge never rejected"

    rows = entrymod._q_chunk_semantic_ref(spark, "").collect()
    # the token-cap sub-split fires: some doc has consecutive chunks
    # where a cohesive group got split (token_count bounded)
    assert all(
        r.token_count <= entrymod._SREF_MAX or r.sentence_count == 1
        for r in rows
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 7's near-dup cohesive group exceeds max tokens -> was split
    d7 = sorted(by_doc[7], key=lambda r: r.chunk_index)
    assert any(r.sentence_count > 1 for r in d7)
    assert len(d7) >= 3
    # context windows present and sized
    for rs in by_doc.values():
        rs = sorted(rs, key=lambda r: r.chunk_index)
        for i, r in enumerate(rs):
            if len(rs) > 1 and i > 0:
                assert r.previous_context == rs[i - 1].chunk_text[-200:]
            if len(rs) > 1 and i < len(rs) - 1:
                assert r.next_context == rs[i + 1].chunk_text[:200]


def test_merge_vector_graph_passthrough_vs_weighted(spark):
    """_merge_and_rank semantics (search_service.py:502-542): shared
    ids blend 0.7/0.3; single-source ids pass through UNCHANGED —
    distinct from weighted_fuse's coalesce-to-zero blend."""
    from cocoindex_data_ingestion_spark.operators.fusion import (
        merge_vector_graph, weighted_fuse,
    )

    vec = spark.createDataFrame([(1, 0.9), (2, 0.8)], "id long, score double")
    gr = spark.createDataFrame([(2, 0.5), (3, 0.4)], "id long, score double")
    m = {r.id: r for r in merge_vector_graph(vec, gr).collect()}
    assert m[1].merged_score == 0.9 and m[1].n_sources == 1  # pass-through
    assert abs(m[2].merged_score - (0.7 * 0.8 + 0.3 * 0.5)) < 1e-9
    assert m[2].n_sources == 2
    assert m[3].merged_score == 0.4  # graph-only pass-through
    w = {r.id: r for r in weighted_fuse(vec, gr, weight=0.7).collect()}
    assert abs(w[1].fused_score - 0.7 * 0.9) < 1e-9  # coalesce-to-zero


def test_rrf_graph_append_semantics(spark):
    """_fuse_results graph blend (search_service.py:416-423): graph
    ids already fused do NOT re-enter; absent ones append with their
    own (flat 1.0) score and outrank the RRF sums."""
    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.operators.fusion import (
        rrf_fuse_graph_append,
    )

    leg = spark.createDataFrame(
        [("vector", 1, 0.9), ("vector", 2, 0.8), ("bm25", 2, 5.0)],
        "source string, id long, score double",
    )
    legs = [leg.filter(F.col("source") == s) for s in ("vector", "bm25")]
    graph = spark.createDataFrame(
        [(2, 1.0), (9, 1.0)], "id long, score double"
    )
    rows = rrf_fuse_graph_append(legs, graph, limit=10).collect()
    by_id = {r.id: r for r in rows}
    assert by_id[9].rrf_score == 1.0 and by_id[9].n_sources == 1
    assert by_id[2].n_sources == 2  # fused row kept, graph dup dropped
    assert rows[0].id == 9  # flat graph score outranks RRF sums


def test_small_to_big_joins_are_broadcast_without_aqe(spark):
    """With auto-broadcast disabled and AQE off, both small_to_big
    joins must STILL plan as BroadcastHashJoin — proving the explicit
    F.broadcast hints (hybrid.py) carry the no-shuffle claim, not
    runtime size estimation."""
    from cocoindex_data_ingestion_spark.operators.hybrid import small_to_big

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        child_hits = spark.createDataFrame(
            [("c1", 0.9), ("c2", 0.5)], "chunk_id string, score double"
        )
        children = spark.createDataFrame(
            [(f"c{i}", f"p{i % 3}") for i in range(50)],
            "chunk_id string, parent_chunk_id string",
        )
        parents = spark.createDataFrame(
            [(f"p{i}", i, 0, f"t{i}") for i in range(3)],
            "parent_chunk_id string, doc_id long, parent_index long, "
            "parent_text string",
        )
        out = small_to_big(child_hits, children, parents, k=5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") == 2, plan
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        # the only exchanges allowed are the window sorts over the
        # <=leg_k joined rows and the broadcast exchanges themselves
        for line in plan.splitlines():
            if "Exchange" in line and "Broadcast" not in line:
                assert "hashpartitioning(parent_chunk_id" in line or (
                    "SinglePartition" in line
                ), line
        rows = out.collect()
        assert {r.parent_chunk_id for r in rows} == {"p1", "p2"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_recursive_flat_word_atom_preconditions(spark):
    """chunk_recursive_flat's oracle rests on the word-atom identity:
    single-line single-spaced corpus, every word <= min_chunk_size
    (40), every document longer than min_chunk_size. Assert the
    bounds at every SF present, plus the atomizer agreement itself on
    a sample document."""
    import os

    from pyspark.sql import functions as F

    from __spark_entry__ import _FLAT_MN
    from cocoindex_data_ingestion_spark.functions import (
        split_recursively as sr,
    )
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        if not os.path.isdir(d):
            continue
        docs = load_table(spark, "documents", d)
        row = docs.select(
            F.min(F.length("text")).alias("mn"),
            F.max(
                F.array_max(
                    F.transform(
                        F.split("text", " "), lambda w: F.length(w)
                    )
                )
            ).alias("maxw"),
            F.max(F.col("text").contains("\n").cast("int")).alias("nl"),
            F.max(F.col("text").contains("  ").cast("int")).alias("dbl"),
        ).first()
        assert row["mn"] > _FLAT_MN, sf
        assert row["maxw"] <= _FLAT_MN, sf
        assert row["nl"] == 0 and row["dbl"] == 0, sf

    # atomizer == word split on such text
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ch = sr.RecursiveChunker(text, 150, _FLAT_MN, 0)
    coll = sr._AtomCollector(text)
    ch._collect(0, len(text), 0, coll)
    words, pos, expect = text.split(" "), 0, []
    for i, w in enumerate(words):
        expect.append((pos, pos + len(w), 0 if i == 0 else 3, 0, 0))
        pos += len(w) + 1
    got = [
        (a.start, a.end, a.boundary_syntax_level, a.internal_lb_level,
         a.boundary_lb_level)
        for a in coll.atoms
    ]
    assert got == expect
    assert coll.min_level == 0  # sentinel syntax level
