"""SplitRecursively cost-model port: the reference's own test grid
(src/ops/functions/split_recursively.rs:1043-1359) plus a property
grid over (chunk_size, min_chunk_size, chunk_overlap)."""

import pytest

from cocoindex_data_ingestion_spark.functions.split_recursively import (
    DOUBLE_NEWLINE, INLINE, NEWLINE, line_break_level, split_recursively,
)


def _consistent(text, chunks):
    for s, e, ctext in chunks:
        assert 0 <= s <= e <= len(text)
        assert text[s:e] == ctext, f"range mismatch [{s},{e})"


# -- ported reference vectors (:1116-1145, :1314-1364) ------------------------


def test_reference_basic_split_no_overlap():
    text = "Linea 1.\nLinea 2.\n\nLinea 3."
    chunks = split_recursively(text, 15, 5, 0)
    assert chunks == [
        (0, 8, "Linea 1."),
        (9, 17, "Linea 2."),
        (19, 27, "Linea 3."),
    ]

    text2 = "A very very long text that needs to be split."
    chunks2 = split_recursively(text2, 20, 12, 0)
    assert len(chunks2) > 1
    assert chunks2[0] == (0, 16, "A very very long")
    assert all(len(c[2]) <= 20 for c in chunks2)
    _consistent(text2, chunks2)


def test_reference_split_with_overlap():
    text = "This is a test text that is a bit longer to see how the overlap works."
    chunks = split_recursively(text, 20, 10, 5)
    assert len(chunks) > 1
    assert len(chunks[0][2]) <= 25
    _consistent(text, chunks)


def test_reference_split_trims_whitespace():
    text = "  \n First chunk. \n\n  Second chunk with spaces at the end.   \n"
    chunks = split_recursively(text, 30, 10, 0)
    assert [c[2] for c in chunks] == [
        " First chunk.",
        "  Second chunk with spaces",
        "at the end.",
    ]
    _consistent(text, chunks)


def test_line_break_level_port():
    assert line_break_level("  ") == INLINE
    assert line_break_level(" \n ") == NEWLINE
    assert line_break_level("\n\n") == DOUBLE_NEWLINE
    assert line_break_level("\r\r") == DOUBLE_NEWLINE
    # mixed CRLF: no two IDENTICAL consecutive break chars
    assert line_break_level("\r\n x") == NEWLINE
    assert line_break_level("a\nb\nc") == NEWLINE


def test_empty_and_whitespace_only():
    assert split_recursively("", 100, 10, 0) == []
    assert split_recursively("   \n\n  \t ", 100, 10, 0) == []


def test_custom_separator_stack():
    # a "language" that splits on semicolons then spaces
    text = "alpha beta; gamma delta; epsilon zeta"
    chunks = split_recursively(
        text, 15, 4, 0, separators=(r";\s*", r"\s+")
    )
    _consistent(text, chunks)
    assert all(len(c[2]) <= 15 for c in chunks)
    assert "".join(text[s:e] for s, e, _ in chunks).replace(" ", "") \
        .replace(";", "") == text.replace(" ", "").replace(";", "")


GRID = [
    (size, mn, ov)
    for size in (30, 80, 200)
    for mn in (5, 15, 40)
    for ov in (0, 10, 25)
    if mn < size and ov < size
]

SAMPLE_TEXTS = [
    "Para one sentence one. Para one sentence two.\n\n"
    "Para two is a little longer and has more words in it. "
    "It keeps going for a while to exercise the splitter.\n\n"
    "Short tail.",
    "line one\nline two\nline three\nline four\nline five\n" * 6,
    "word " * 120,
    "unbroken" * 40,
    "Mixed.  Spacing\tand\ttabs.\n\n\nTriple breaks.\r\nCRLF line.",
]


@pytest.mark.parametrize("size,mn,ov", GRID)
def test_grid_contract(size, mn, ov):
    """Reference contract over the parameter grid: range consistency,
    ordered starts, coverage of all non-whitespace content, and the
    size bound (atoms larger than chunk_size can only come from
    unbreakable runs — the forced-oversize path of the DP)."""
    for text in SAMPLE_TEXTS:
        chunks = split_recursively(text, size, mn, ov)
        _consistent(text, chunks)
        starts = [s for s, _e, _t in chunks]
        assert starts == sorted(starts)
        covered = "".join(t for _s, _e, t in chunks)
        for word in text.split():
            assert word in covered or any(word in t for _s, _e, t in chunks)
        longest_atom_free = max(
            (len(w) for w in text.split()), default=0
        )
        for _s, _e, t in chunks:
            assert len(t) <= max(size, longest_atom_free)
