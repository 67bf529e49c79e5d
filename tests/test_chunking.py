"""Chunker property tests (reference contract,
src/ops/functions/split_recursively.rs:1049-1071 + FIXTURES.md §D):
every chunk's [start, end) range reproduces its text from the
original; chunks cover the document in order; sizes respect bounds."""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import chunking

FIXTURE_TEXTS = [
    (1, ""),
    (2, "short."),
    (3, "# Heading\n\nPara one. Two sentences here.\n\nPara two follows. "
        "With more. And more.\n\n## Sub\n\ncode block text " * 3),
    (4, "Dr. Smith met e.g. the team. " * 30),
    (5, "unbroken" * 200),
    (6, "unicode — dash and nbsp. Ends here."),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(FIXTURE_TEXTS, "doc_id long, text string")


def _check_range_consistency(rows, texts_by_id):
    for r in rows:
        original = texts_by_id[r.doc_id]
        assert 0 <= r.location_start <= r.location_end <= len(original), r
        assert original[r.location_start:r.location_end] == r.chunk_text, (
            f"range mismatch doc={r.doc_id} [{r.location_start},{r.location_end})"
        )


def test_fixed_chunks_properties(spark, docs):
    size, overlap = 100, 20
    rows = chunking.fixed_chunks(docs, size, overlap).collect()
    texts = dict(FIXTURE_TEXTS)
    _check_range_consistency(rows, texts)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, text in FIXTURE_TEXTS:
        chunks = sorted(by_doc.get(did, []), key=lambda r: r.chunk_index)
        assert chunks, f"doc {did} produced no chunks"
        assert chunks[0].location_start == 0
        # coverage: consecutive starts advance by stride, last reaches end
        for a, b in zip(chunks, chunks[1:]):
            assert b.location_start - a.location_start == size - overlap
        assert chunks[-1].location_end == len(text) or len(text) == 0
        assert all(len(c.chunk_text) <= size for c in chunks)


def test_sentence_chunks_properties(spark, docs):
    rows = chunking.sentence_chunks(docs, chunk_size=120).collect()
    # range consistency holds for sentence chunks too: offsets are
    # measured in the original text and chunk_text IS text[start:end]
    # even when inter-sentence separators are not single spaces
    _check_range_consistency(rows, dict(FIXTURE_TEXTS))
    for r in rows:
        assert r.chunk_text  # no empty chunks
        assert len(r.chunk_id) == 32  # md5 deterministic id
    # determinism: same input -> same ids
    again = chunking.sentence_chunks(docs, chunk_size=120).collect()
    assert {(r.doc_id, r.chunk_index, r.chunk_id) for r in rows} == {
        (r.doc_id, r.chunk_index, r.chunk_id) for r in again
    }


def test_recursive_chunks_properties(spark, docs):
    size = 150
    rows = chunking.recursive_chunks(docs, chunk_size=size).collect()
    texts = dict(FIXTURE_TEXTS)
    _check_range_consistency(rows, texts)
    for r in rows:
        assert len(r.chunk_text) <= size + 1
    # order within docs
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r.chunk_index)
        starts = [c.location_start for c in chunks]
        assert starts == sorted(starts)


def test_two_tier_chunks_schema_and_tokens(spark, docs):
    rows = chunking.two_tier_chunks(docs.filter("doc_id = 3")).collect()
    assert rows
    texts = dict(FIXTURE_TEXTS)
    for r in rows:
        assert r.chunk_level == "semantic"
        assert len(r.chunk_id) == 32 and len(r.parent_chunk_id) == 32
        assert all(t == t.lower() and len(t) >= 3 for t in r.bm25_tokens)
        assert r.chunk_size == len(r.bm25_tokens)
        # child offsets, rebased by the parent page, reproduce the
        # child text from the ORIGINAL document (inherited range
        # contract — valid because pages are verbatim windows)
        assert (
            texts[r.document_id][r.location_start:r.location_end]
            == r.chunk_text
        )
