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


# -- per-language separator stacks (split_recursively.rs:96-236 dispatch) -----

from cocoindex_data_ingestion_spark.functions.split_recursively import (  # noqa: E402
    DEFAULT_SEPARATORS, LANGUAGE_SEPARATORS, resolve_separators,
)

LANG_SAMPLES = {
    "python": (
        "import os\n\n\nclass Greeter:\n    def greet(self, name):\n"
        "        return f'hi {name}'\n\n    def wave(self):\n"
        "        return 'wave'\n\n\ndef main():\n    g = Greeter()\n"
        "    print(g.greet('world'))\n"
    ),
    "markdown": (
        "# Title\n\nIntro paragraph with a few words in it.\n\n"
        "## Section A\n\nBody of section A, also several words long.\n\n"
        "## Section B\n\n- item one\n- item two\n\n### Sub\n\nTail text.\n"
    ),
    "rust": (
        "use std::fmt;\n\npub struct Point { x: f64, y: f64 }\n\n"
        "impl Point {\n    pub fn norm(&self) -> f64 {\n"
        "        (self.x * self.x + self.y * self.y).sqrt()\n    }\n}\n\n"
        "fn main() {\n    let p = Point { x: 3.0, y: 4.0 };\n"
        "    println!(\"{}\", p.norm());\n}\n"
    ),
    "go": (
        "package main\n\nimport \"fmt\"\n\ntype Point struct {\n"
        "\tX, Y float64\n}\n\nfunc (p Point) Norm() float64 {\n"
        "\treturn p.X*p.X + p.Y*p.Y\n}\n\nfunc main() {\n"
        "\tfmt.Println(Point{3, 4}.Norm())\n}\n"
    ),
    "sql": (
        "CREATE TABLE t (id INT, v TEXT);\n"
        "INSERT INTO t VALUES (1, 'a'), (2, 'b');\n"
        "SELECT id, count(*) FROM t GROUP BY id;\n"
        "UPDATE t SET v = 'c' WHERE id = 1;\n"
    ),
    "yaml": (
        "name: demo\nversion: 1\n---\nitems:\n  - a\n  - b\n"
        "config:\n  depth: 3\n  wide: true\n"
    ),
    "javascript": (
        "import { x } from './x';\n\nexport class Foo {\n"
        "  constructor() { this.n = 1; }\n}\n\n"
        "function bar() {\n  return new Foo();\n}\n\n"
        "const baz = () => bar();\n"
    ),
}


def test_language_resolution_semantics():
    # name, alias, and extension all hit the same stack, case-insensitive
    assert resolve_separators("Python") == resolve_separators(".py")
    assert resolve_separators("RUST") == resolve_separators("rs")
    assert resolve_separators("md") == resolve_separators("Markdown")
    assert resolve_separators("cpp") == resolve_separators(".hpp")
    # unknown / None fall back to the default stack
    assert resolve_separators(None) == DEFAULT_SEPARATORS
    assert resolve_separators("klingon") == DEFAULT_SEPARATORS
    # custom languages take precedence over builtins
    custom = {"Python": (r";", r"\s+")}
    assert resolve_separators("python", custom) == (r";", r"\s+")
    # every builtin stack ends with the default tail (paragraph/line/word)
    for stack in LANGUAGE_SEPARATORS.values():
        assert stack[-3:] == DEFAULT_SEPARATORS


@pytest.mark.parametrize("lang", sorted(LANG_SAMPLES))
@pytest.mark.parametrize("size,mn,ov", [(60, 20, 0), (120, 40, 20)])
def test_language_grid_contract(lang, size, mn, ov):
    """The reference consistency grid (range exactness, ordered starts,
    full content coverage, size bound) holds under every per-language
    separator stack."""
    text = LANG_SAMPLES[lang]
    chunks = split_recursively(
        text, size, mn, ov, separators=resolve_separators(lang)
    )
    _consistent(text, chunks)
    starts = [s for s, _e, _t in chunks]
    assert starts == sorted(starts)
    covered = "".join(t for _s, _e, t in chunks)
    for word in text.split():
        assert word in covered or any(word in t for _s, _e, t in chunks)
    longest_word = max((len(w) for w in text.split()), default=0)
    for _s, _e, t in chunks:
        assert len(t) <= max(size, longest_word)


def test_python_stack_prefers_def_boundaries():
    text = LANG_SAMPLES["python"]
    chunks = split_recursively(
        text, 80, 20, 0, separators=resolve_separators("python")
    )
    _consistent(text, chunks)
    # at this size at least one chunk should start exactly at a
    # class/def declaration — the whole point of the language stack
    heads = [t.lstrip()[:6] for _s, _e, t in chunks]
    assert any(h.startswith(("class ", "def ")) for h in heads)


def test_markdown_stack_prefers_heading_boundaries():
    text = LANG_SAMPLES["markdown"]
    chunks = split_recursively(
        text, 70, 20, 0, separators=resolve_separators("markdown")
    )
    _consistent(text, chunks)
    heads = [t.lstrip() for _s, _e, t in chunks]
    assert any(h.startswith("## ") for h in heads)


# -- remaining reference vectors: nullability + unicode offsets ---------------
#
# rs:1185-1202 (Null text -> Null output) and
# rs:1203-1275 (test_translate_bytes_to_chars_simple): the reference
# chunks in BYTE offsets and translates to char offsets at output; we
# chunk in char offsets natively, so the pinned contract is the same
# OBSERVABLE one — ranges are char-exact against the original text
# even when multi-byte codepoints precede the chunk.


def test_unicode_char_offsets():
    # "abc😄def" — the rs byte->char translation vector; char offsets
    # must index the ORIGINAL string exactly (😄 is 1 char, 4 bytes)
    text = "abc\U0001F604def ghi jkl mno pqr stu vwx"
    chunks = split_recursively(text, 12, 4, 0)
    _consistent(text, chunks)
    text2 = "héllo wörld\n\nsección número dos con más pálabras aquí\n\n日本語のテキストもある"
    chunks2 = split_recursively(text2, 20, 6, 0)
    _consistent(text2, chunks2)
    assert len(chunks2) >= 3


def test_null_text_contract(spark):
    # rs:1185-1202 — Null text produces no chunk rows (the flow-level
    # Value::Null), other docs in the same batch unaffected
    from cocoindex_data_ingestion_spark.operators.chunking import (
        chunk_recursive_dp,
    )

    df = spark.createDataFrame(
        [(1, "Linea 1.\nLinea 2.\n\nLinea 3."), (2, None)],
        "doc_id long, text string",
    )
    out = chunk_recursive_dp(df, chunk_size=15, min_chunk_size=5).collect()
    assert {r.doc_id for r in out} == {1}
    got = [(r.location_start, r.location_end, r.chunk_text)
           for r in sorted(out, key=lambda r: r.chunk_index)]
    # the rs:1116-1145 expected KTable, reproduced through the Spark op
    assert got == [(0, 8, "Linea 1."), (9, 17, "Linea 2."),
                   (19, 27, "Linea 3.")]
