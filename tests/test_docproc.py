"""App DocumentProcessor semantics (document_processor.py:204-253):
markdown section extraction + preprocess_text."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.docproc import (
    extract_sections,
    preprocess_text_col,
)


def _secs(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = extract_sections(df)
    return [
        (r["section_idx"], r["level"], r["title"], r["content"])
        for r in out.orderBy("section_idx").collect()
    ]


def test_sections_basic_and_preamble_dropped(spark):
    text = (
        "intro line never saved\n"
        "# Alpha\n"
        "a1\na2\n"
        "## Beta\n"
        "b1\n"
    )
    assert _secs(spark, text) == [
        (1, 1, "Alpha", "a1\na2"),
        (2, 2, "Beta", "b1"),
    ]


def test_non_headers(spark):
    # 7+ hashes and hash-without-whitespace are content, not headers
    # (the ^(#{1,6})\s+(.+)$ match, document_processor.py:219)
    text = "# A\n####### seven\n#NoSpace\nplain\n"
    assert _secs(spark, text) == [
        (1, 1, "A", "####### seven\n#NoSpace\nplain"),
    ]


def test_title_keeps_trailing_whitespace_and_tab_separator(spark):
    text = "##\t Tabbed \ncontent"
    assert _secs(spark, text) == [(1, 2, "Tabbed ", "content")]


def test_empty_section_content(spark):
    text = "# A\n# B\ntail"
    assert _secs(spark, text) == [(1, 1, "A", ""), (2, 1, "B", "tail")]


def test_content_stripped_all_whitespace(spark):
    # Python str.strip() strips newlines/tabs too, not just spaces
    text = "# A\n\n  x  \n\n"
    assert _secs(spark, text) == [(1, 1, "A", "x")]


def test_no_headers_no_sections(spark):
    assert _secs(spark, "just\nplain\ntext") == []


def test_preprocess_text(spark):
    df = spark.createDataFrame(
        [("  a   b\t\nc $%@ (d-e) 'q' #x/y!  ",)], "t string"
    )
    got = df.select(preprocess_text_col(F.col("t")).alias("c")).first()["c"]
    # whitespace collapsed, $%@# dropped, keep-set punctuation kept
    # (document_processor.py:207-212)
    assert got == "a b c  (d-e) 'q' x/y!"
