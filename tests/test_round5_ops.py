"""Round-5 operators: candidate-set-IDF BM25 compat mode, filtered
RAG retrieval, extraction-run comparison, MMR candidate guard."""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import bm25 as bm25_ops


# -- BM25 candidate-set-IDF compat mode ---------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_refidf_agrees_when_every_doc_is_a_candidate(spark):
    """When all docs match ≥1 query term, the candidate set IS the
    corpus → both modes score identically (N, avgdl, df all equal)."""
    docs = _docs(spark, [
        (1, "alpha alpha beta gamma"),
        (2, "alpha delta delta gamma"),
        (3, "beta beta beta gamma epsilon"),
    ])
    q = ["alpha", "beta"]
    corpus = {r.doc_id: r.score for r in bm25_ops.bm25_search(docs, q, k=10).collect()}
    cand = {r.doc_id: r.score for r in
            bm25_ops.bm25_search_candidate_idf(docs, q, k=10).collect()}
    assert corpus == cand


def test_refidf_diverges_on_crafted_corpus(spark):
    """Crafted divergence: many long non-matching docs inflate corpus
    avgdl, deflating the corpus-mode length penalty for the short
    matching docs. Candidate-set avgdl is computed over matches only,
    so the length normalization bites harder on the relatively-longer
    candidate — flipping the rank of doc 1 vs doc 2.

    doc1: 1 hit of 'alpha' in length 2; doc2: 2 hits in length 12.
    Candidate avgdl = 7 → doc2's tf advantage survives saturation.
    Corpus avgdl inflated to 43.67 by the filler docs → both docs look
    'short', tf saturates toward k1+1, doc1 and doc2 converge and the
    tie breaks differently.
    """
    filler = "zeta " * 100
    docs = _docs(spark, [
        (1, "alpha omega"),
        (2, "alpha alpha " + "omega " * 10),
        (3, filler),
        (4, filler),
        (5, filler),
    ])
    q = ["alpha"]
    corpus = [r.doc_id for r in bm25_ops.bm25_search(docs, q, k=2).collect()]
    cand = [r.doc_id for r in
            bm25_ops.bm25_search_candidate_idf(docs, q, k=2).collect()]
    # same matched set either way
    assert set(corpus) == set(cand) == {1, 2}
    # candidate-set mode must reproduce the reference's N: score formula
    # with N=2 gives idf=ln(1+0.5/2.5), corpus mode N=5 → idf=ln(1+3.5/1.5);
    # with only one query term the ORDER can also flip — assert the scores
    # actually diverge between modes (score-level compat is the point)
    corpus_scores = {r.doc_id: r.score for r in
                     bm25_ops.bm25_search(docs, q, k=2).collect()}
    cand_scores = {r.doc_id: r.score for r in
                   bm25_ops.bm25_search_candidate_idf(docs, q, k=2).collect()}
    assert corpus_scores != cand_scores


def test_refidf_matches_reference_formula_exactly(spark):
    """Score-level parity with the reference's Python scorer
    (search_service.py:320-348) computed by hand here."""
    import math

    texts = {
        1: "alpha beta beta gamma",
        2: "alpha alpha delta",
        3: "zeta zeta zeta zeta",
    }
    docs = _docs(spark, list(texts.items()))
    q = ["alpha", "beta"]
    # reference scorer, uncapped candidate fetch
    toks = {d: t.split() for d, t in texts.items()}
    cands = [d for d, t in toks.items() if any(w in t for w in q)]
    N = len(cands)
    lengths = {d: len(toks[d]) for d in cands}
    avgdl = sum(lengths.values()) / len(lengths)
    k1, b = bm25_ops.K1, bm25_ops.B
    df = {w: sum(1 for d in cands if w in toks[d]) for w in q}
    expect = {}
    for d in cands:
        s = 0.0
        for w in q:
            tf = toks[d].count(w)
            if tf == 0:
                continue
            idf = math.log((N - df[w] + 0.5) / (df[w] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lengths[d] / avgdl))
        expect[d] = round(s, 4)
    got = {r.doc_id: r.score for r in
           bm25_ops.bm25_search_candidate_idf(docs, q, k=10).collect()}
    assert got == pytest.approx(expect)


# -- filtered RAG retrieval ---------------------------------------------------


def test_rag_filtered_respects_access_filters(spark):
    """Every citation in the filtered context must point at a doc in
    the allowed (department, security_level) set; the filter must
    actually bite (context differs from the unfiltered assembly)."""
    import re

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    filtered = entry.queries()["rag_context_assembly_filtered"](spark, sf).collect()[0]
    plain = entry.queries()["rag_context_assembly"](spark, sf).collect()[0]
    ids = [int(m) for m in re.findall(r"\[doc:(\d+)\]", filtered["context"])]
    assert len(ids) == filtered["n_chunks"] > 0
    for did in ids:
        # doc_id % 4 ∈ {engineering=0, legal=2}; % 3 ∈ {public=0, internal=1}
        assert did % 4 in (0, 2), did
        assert did % 3 in (0, 1), did
    assert filtered["context"] != plain["context"]


def test_access_filter_absent_selects_match_everything(spark):
    from cocoindex_data_ingestion_spark.operators.docmeta import (
        access_filter, derive_access_metadata,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    meta = derive_access_metadata(docs)
    assert meta.filter(access_filter(None, None)).count() == 12
    eng = meta.filter(access_filter(("engineering",), None))
    assert eng.count() == 3  # ids 0,4,8
    both = meta.filter(access_filter(("engineering",), ("public",)))
    assert [r.doc_id for r in both.collect()] == [0]


# -- multi-model extraction comparison ---------------------------------------


def _mentions(spark, rows):
    return spark.createDataFrame(
        rows,
        "chunk_id string, document_id string, text string, type string, "
        "start_offset int, end_offset int, confidence double",
    )


def test_compare_extraction_runs_metrics(spark):
    from cocoindex_data_ingestion_spark.operators import entities as ent

    # doc 1: A={spark/TECH, hash/CONCEPT}, B={spark/TECH, hash/OPERATION}
    #   → agreed=1 (hash disagrees on type), jaccard=1/3
    # doc 2: A only; doc 3: B only
    a = _mentions(spark, [
        ("1", "1", "Spark", "TECHNOLOGY", 0, 5, 1.0),
        ("1", "1", "hash", "CONCEPT", 6, 10, 1.0),
        ("2", "2", "join", "OPERATION", 0, 4, 1.0),
    ])
    b = _mentions(spark, [
        ("1", "1", "spark", "TECHNOLOGY", 0, 5, 0.9),
        ("1", "1", "hash", "OPERATION", 6, 10, 0.9),
        ("3", "3", "vector", "CONCEPT", 0, 6, 0.9),
    ])
    out = {r["document_id"]: r for r in ent.compare_extraction_runs(a, b).collect()}
    assert set(out) == {"1", "2", "3"}
    r1 = out["1"]
    assert (r1.n_a, r1.n_b, r1.n_agreed) == (2, 2, 1)
    assert r1.precision_a == 0.5 and r1.recall_a == 0.5
    assert r1.jaccard == pytest.approx(0.3333)
    r2 = out["2"]
    assert (r2.n_a, r2.n_b, r2.n_agreed) == (1, 0, 0)
    assert r2.recall_a is None  # no B entities → recall undefined
    assert out["3"].precision_a is None


def test_type_confusion_and_consensus(spark):
    from cocoindex_data_ingestion_spark.operators import entities as ent

    a = _mentions(spark, [
        ("1", "1", "hash", "CONCEPT", 0, 4, 1.0),
        ("1", "1", "Spark", "TECHNOLOGY", 5, 10, 1.0),
    ])
    b = _mentions(spark, [
        ("1", "1", "hash", "OPERATION", 0, 4, 0.9),
        ("1", "1", "spark", "TECHNOLOGY", 5, 10, 0.9),
    ])
    conf = {(r.type_a, r.type_b): r.n_pairs
            for r in ent.type_confusion_matrix(a, b).collect()}
    assert conf == {("CONCEPT", "OPERATION"): 1, ("TECHNOLOGY", "TECHNOLOGY"): 1}

    cons = {(r.name, r.type): r for r in ent.consensus_entities(a, b).collect()}
    # spark agreed by both runs → 2 sources, max confidence 1.0
    sp = cons[("spark", "TECHNOLOGY")]
    assert sp.n_sources == 2 and sp.confidence == 1.0 and sp.sources == "a,b"
    # the type disagreement doubles 'hash' — exactly the reference's
    # name+type key behavior the confusion matrix exposes
    assert cons[("hash", "CONCEPT")].n_sources == 1
    assert cons[("hash", "OPERATION")].sources == "b"


# -- MMR candidate-volume guard ----------------------------------------------


def test_mmr_rerank_guards_candidate_volume(spark):
    from cocoindex_data_ingestion_spark.operators import vector_search

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 6)],
        "vec_id long, embedding array<float>",
    )
    q = spark.createDataFrame([([1.0, 0.5],)], "qvec array<float>")
    with pytest.raises(ValueError, match="MMR_MAX_CANDIDATES"):
        vector_search.mmr_rerank(
            emb, q, n_candidates=vector_search.MMR_MAX_CANDIDATES + 1, k=3
        )
    # at-bound pool still runs (result bounded by corpus size here)
    out = vector_search.mmr_rerank(emb, q, n_candidates=5, k=3).collect()
    assert len(out) == 3


# -- corpus precondition for the chunk_sentence oracle ------------------------


def test_corpus_has_no_sentence_punctuation():
    """The chunk_sentence oracle states the whole-doc-chunk identity,
    which holds iff no doc contains [.!?] and none is empty — assert
    that precondition at every SF the driver/judge use."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        p = f"/root/testdata/sf{sf}/documents.parquet"
        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{p}') "
            "WHERE regexp_matches(text, '[.!?]') "
            "   OR text IS NULL OR length(trim(text)) = 0"
        ).fetchone()[0]
        assert n == 0, f"sf{sf}: {n} docs violate the oracle precondition"
