"""App-level greedy recursive chunker
(document_processor.py:56-114): separator hierarchy, tail-window
break search, skip-but-advance, id/offset quirks."""

from __future__ import annotations

import hashlib

from cocoindex_data_ingestion_spark.operators.docproc import (
    recursive_chunk_text,
    recursive_chunks_ref,
)


def test_single_window_no_break_search(spark):
    # content shorter than chunk_size: one chunk, no separator logic
    out = recursive_chunk_text("hello world", 100, 10, 5)
    assert out == [
        (0, 0, 11, "hello world",
         hashlib.md5(b"hello world").hexdigest()[:8])
    ]


def test_separator_hierarchy_order():
    # both '\n' and '. ' in the tail: '\n' (higher tier) wins even
    # though '. ' occurs later in the window
    content = "x" * 85 + "\n" + "y" * 8 + ". " + "z" * 40
    out = recursive_chunk_text(content, 100, 10, 5)
    # tail = content[80:100] contains '\n' (pos 85) and '. ' (pos 94)
    # '\n\n' absent, '\n' tier fires first → break after last '\n'
    first = out[0]
    assert first[3].endswith("y" * 8) is False  # stripped text ends pre-\n
    assert first[2] == 86  # end = last '\n' + 1
    # cursor advanced 86 - 10 = 76
    assert out[1][1] == 76


def test_break_at_last_occurrence_in_window():
    # several spaces in the tail → break after the LAST one
    content = "a" * 81 + " b c d " + "e" * 60
    out = recursive_chunk_text(content, 100, 10, 5)
    # window = content[:100]; last ' ' at index 87 → break_len 88
    assert out[0][2] == 88


def test_min_size_skips_but_advances():
    # middle window strips to < min size → skipped, cursor still moves
    content = "A" * 95 + " " + " " * 30 + "B" * 100
    out = recursive_chunk_text(content, 100, 40, 50)
    starts = [c[1] for c in out]
    # some chunk was skipped: indexes stay consecutive from 0
    assert [c[0] for c in out] == list(range(len(out)))
    assert len(out) >= 1
    assert all(len(c[3]) >= 50 for c in out)
    assert starts == sorted(starts)


def test_id_is_md5_of_unstripped_and_end_counts_unstripped():
    content = "x" * 50 + "   " + "\n\n" + "y" * 80
    # chunk_size 60 → window = 50 x's + '   ' + '\n\n' + 5 y's;
    # tail from 48: contains '\n\n' → break after it (len 55)
    out = recursive_chunk_text(content, 60, 10, 5)
    idx, s, e, txt, cid = out[0]
    raw = content[s:e]
    assert txt == raw.strip()
    assert cid == hashlib.md5(raw.encode()).hexdigest()[:8]
    assert raw != txt  # quirk actually exercised


def test_corpus_form_matches_single_doc(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta " * 30), (2, "short")],
        "doc_id long, text string",
    )
    got = sorted(
        (
            r["doc_id"], r["chunk_index"], r["location_start"],
            r["location_end"], r["chunk_text"], r["chunk_id"],
        )
        for r in recursive_chunks_ref(
            docs, chunk_size=100, chunk_overlap=20, min_chunk_size=5
        ).collect()
    )
    ref = []
    for did, text in [(1, "alpha beta " * 30), (2, "short")]:
        for tup in recursive_chunk_text(text, 100, 20, 5):
            ref.append((did, *tup))
    assert got == sorted(ref)
