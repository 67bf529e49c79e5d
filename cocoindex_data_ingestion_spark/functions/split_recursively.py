"""SplitRecursively: faithful port of the reference's cost-based
recursive chunker (regex-separator path).

Reference: src/ops/functions/split_recursively.rs —
- separator stacks (:46-54): text is recursively split by an ordered
  regex stack (default ``\\n\\n+`` → ``\\n`` → ``\\s+``); pieces at or
  under ``min_chunk_size`` become ATOMS, larger pieces recurse to the
  next separator level. Custom per-language stacks plug in as a list
  of regexes (the tree-sitter code path is out of scope here — its
  atoms feed the same merge DP).
- atom collection (:411-473): whitespace-trimmed, boundary/internal
  line-break levels, syntax level = min recursion depth crossed since
  the previous atom, plus line-start re-alignment of atoms that
  follow a line break.
- merge DP (:27-30, 597-743): atoms are merged into chunks by a
  shortest-path DP whose edge costs are
  ``SYNTAX_LEVEL_GAP_COST`` (harmonic: Σ 512/i over the level gap),
  ``PER_LINE_BREAK_LEVEL_GAP_COST`` (64 × line-break level gap),
  ``TOO_SMALL_CHUNK_COST`` (2^20 for chunks under min_chunk_size),
  and ``MISSING_OVERLAP_COST`` (512-scaled overlap shortfall; with
  overlap a max-heap picks the cheapest admissible previous plan
  within the overlap window).

This is per-document sequential logic → pure Python here, executed
inside ``mapInPandas`` by operators/chunking.chunk_recursive_dp (the
Spark plumbing). Offsets are Python character offsets (the reference
uses byte offsets; identical on ASCII, and the [start, end) →
text[start:end] contract is preserved either way).
"""

from __future__ import annotations

import heapq
import re
from dataclasses import dataclass

SYNTAX_LEVEL_GAP_COST = 512       # split_recursively.rs:27
MISSING_OVERLAP_COST = 512        # :28
PER_LINE_BREAK_LEVEL_GAP_COST = 64  # :29
TOO_SMALL_CHUNK_COST = 1 << 20    # :30

DEFAULT_SEPARATORS = (r"\n\n+", r"\n", r"\s+")  # :50

# ---------------------------------------------------------------- languages
#
# The reference dispatches ~27 languages to tree-sitter syntax trees
# (split_recursively.rs:96-236) whose atoms feed the same merge DP;
# unknown languages fall back to the default regex stack, and the op
# spec can add custom per-language regex stacks
# (split_recursively.rs:770-800). tree-sitter isn't available here, so
# every builtin language gets a syntax-aware REGEX separator stack
# instead: coarse declaration boundaries first (zero-width lookahead so
# only the newline is consumed and offsets stay exact), then the
# default paragraph/line/word tail. Language names and aliases
# (including file extensions) mirror the reference's table so the same
# `language=` strings resolve.

_TAIL = DEFAULT_SEPARATORS


def _kw(*words: str) -> str:
    """Boundary before a line whose first token is one of ``words``;
    consumes only the newline."""
    return r"\n(?=\s*(?:" + "|".join(words) + r")\b)"


_LANGUAGE_CONFIGS: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = (
    ("C", (".c",),
     (_kw("struct", "enum", "union", "typedef", "static", "void", "int",
          "char", "float", "double", "unsigned", "long"),
      r"\n(?=\s*#\s*(?:include|define|ifdef|ifndef|endif)\b)") + _TAIL),
    ("C++", (".cpp", ".cc", ".cxx", ".h", ".hpp", "cpp"),
     (_kw("class", "namespace", "template", "struct", "enum", "union",
          "typedef", "static", "void", "int", "char", "float", "double",
          "unsigned", "long", "virtual"),
      r"\n(?=\s*#\s*(?:include|define|ifdef|ifndef|endif|pragma)\b)") + _TAIL),
    ("C#", (".cs", "cs", "csharp"),
     (_kw("namespace", "class", "interface", "struct", "enum", "public",
          "private", "protected", "internal", "static", "void"),) + _TAIL),
    ("CSS", (".css", ".scss"),
     (r"\n(?=\s*@(?:media|keyframes|supports|font-face|import)\b)",
      r"(?<=\})\n") + _TAIL),
    ("Fortran", (".f", ".f90", ".f95", ".f03", "f", "f90", "f95", "f03"),
     (_kw("subroutine", "function", "module", "program", "contains",
          "interface", "type"),) + _TAIL),
    ("Go", (".go", "golang"),
     (_kw("func", "type", "var", "const", "import", "package"),) + _TAIL),
    ("HTML", (".html", ".htm"),
     (r"\n(?=\s*<(?:html|head|body|div|section|article|main|nav|aside|"
      r"h[1-6]|p|table|ul|ol|li|form)\b)",) + _TAIL),
    ("Java", (".java",),
     (_kw("class", "interface", "enum", "record", "public", "protected",
          "private", "static", "final", "abstract"),) + _TAIL),
    ("JavaScript", (".js", "js"),
     (_kw("function", "class", "const", "let", "var", "export", "import",
          "async"),) + _TAIL),
    ("JSON", (".json",),
     (r"\n(?=\s*[\"{\[])",) + _TAIL),
    ("Kotlin", (".kt", ".kts"),
     (_kw("class", "interface", "object", "fun", "val", "var",
          "companion", "data"),) + _TAIL),
    ("Markdown", (".md", ".mdx", "md"),
     (r"\n(?=#\s)", r"\n(?=##\s)", r"\n(?=#{3,6}\s)", r"\n(?=```)",
      r"\n(?=(?:\*\*\*+|---+|___+)\s*\n)") + _TAIL),
    ("Pascal", (".pas", "pas", ".dpr", "dpr", "Delphi"),
     (_kw("procedure", "function", "unit", "program", "interface",
          "implementation", "type", "var", "const", "begin", "end"),) + _TAIL),
    ("PHP", (".php",),
     (_kw("function", "class", "namespace", "use", "public", "private",
          "protected", "trait", "interface"),) + _TAIL),
    ("Python", (".py",),
     (r"\n(?=class\s)", r"\n(?=\s*(?:def|async\s+def)\s)",
      r"\n(?=\s*@\w)") + _TAIL),
    ("R", (".r",),
     (r"\n(?=\s*[A-Za-z._][A-Za-z0-9._]*\s*(?:<-|=)\s*function\b)",
      _kw("if", "for", "while", "repeat", "library", "source")) + _TAIL),
    ("Ruby", (".rb",),
     (_kw("class", "module", "def", "if", "unless", "while", "until",
          "begin", "require"),) + _TAIL),
    ("Rust", (".rs", "rs"),
     (_kw("pub", "fn", "struct", "enum", "impl", "trait", "mod", "use",
          "const", "static", "macro_rules!", "unsafe", "async"),) + _TAIL),
    ("Scala", (".scala",),
     (_kw("class", "trait", "object", "def", "val", "var", "case",
          "implicit", "import", "package"),) + _TAIL),
    ("SQL", (".sql",),
     (r"\n(?=\s*(?i:select|insert|update|delete|create|alter|drop|with|"
      r"merge|grant|revoke|begin|commit)\b)",) + _TAIL),
    ("Swift", (".swift",),
     (_kw("class", "struct", "enum", "protocol", "extension", "func",
          "var", "let", "import"),) + _TAIL),
    ("TOML", (".toml",),
     (r"\n(?=\[)", r"\n(?=[A-Za-z0-9_-]+\s*=)") + _TAIL),
    ("TSX", (".tsx",),
     (_kw("function", "class", "const", "let", "var", "export", "import",
          "interface", "type", "enum", "async"),) + _TAIL),
    ("TypeScript", (".ts", "ts"),
     (_kw("function", "class", "const", "let", "var", "export", "import",
          "interface", "type", "enum", "namespace", "async"),) + _TAIL),
    ("XML", (".xml",),
     (r"\n(?=\s*<[A-Za-z!?])",) + _TAIL),
    ("DTD", (".dtd",),
     (r"\n(?=\s*<!)",) + _TAIL),
    ("YAML", (".yaml", ".yml"),
     (r"\n(?=---)", r"\n(?=[^\s#-][^:\n]*:)", r"\n(?=-\s)") + _TAIL),
)

LANGUAGE_SEPARATORS: dict[str, tuple[str, ...]] = {}
for _name, _aliases, _stack in _LANGUAGE_CONFIGS:
    for _key in (_name, *_aliases):
        LANGUAGE_SEPARATORS[_key.lower()] = _stack


def resolve_separators(
    language: str | None,
    custom_languages: dict[str, tuple[str, ...]] | None = None,
) -> tuple[str, ...]:
    """Language (name, alias, or file extension; case-insensitive) →
    separator stack; unknown or None → DEFAULT_SEPARATORS, mirroring
    the reference's fallback (split_recursively.rs:817-830). Custom
    languages (the op spec's ``custom_languages``,
    split_recursively.rs:770-800) take precedence over builtins."""
    if not language:
        return DEFAULT_SEPARATORS
    key = language.strip().lower()
    if custom_languages:
        for cname, stack in custom_languages.items():
            if cname.strip().lower() == key:
                return tuple(stack)
    return LANGUAGE_SEPARATORS.get(key, DEFAULT_SEPARATORS)

# line-break levels (:373-390)
INLINE, NEWLINE, DOUBLE_NEWLINE = 0, 1, 2

_INLINE_SPACE = " \t"


def line_break_level(s: str) -> int:
    """Port of line_break_level (:392-410) including its shared-
    iterator scan order."""
    lb = INLINE
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        i += 1
        if c in "\n\r":
            lb = NEWLINE
            while i < n:
                c2 = s[i]
                i += 1
                if c2 in "\n\r":
                    if c2 == c:
                        return DOUBLE_NEWLINE
                else:
                    break
    return lb


@dataclass
class _Atom:
    start: int
    end: int
    boundary_syntax_level: int
    internal_lb_level: int
    boundary_lb_level: int


class _AtomCollector:
    """Port of AtomChunksCollector (:425-473)."""

    def __init__(self, full_text: str):
        self.full_text = full_text
        self.curr_level = 0
        self.min_level = 0
        self.atoms: list[_Atom] = []

    def collect(self, start: int, end: int) -> None:
        seg = self.full_text[start:end]
        end_trimmed = seg.rstrip()
        if not end_trimmed:
            return
        trimmed = end_trimmed.lstrip()
        new_start = start + (len(end_trimmed) - len(trimmed))
        new_end = new_start + len(trimmed)

        prev_end = self.atoms[-1].end if self.atoms else 0
        gap = self.full_text[prev_end:new_start]
        boundary_lb = line_break_level(gap)
        if boundary_lb != INLINE:
            # align to beginning of line when preceded by a line break
            trimmed_gap = gap.rstrip(_INLINE_SPACE)
            a_start, a_end = prev_end + len(trimmed_gap), new_end
        else:
            a_start, a_end = new_start, new_end

        self.atoms.append(
            _Atom(
                a_start, a_end, self.min_level,
                line_break_level(trimmed), boundary_lb,
            )
        )
        self.min_level = self.curr_level

    def finish(self) -> list[_Atom]:
        n = len(self.full_text)
        self.atoms.append(
            _Atom(n, n, self.min_level, INLINE, DOUBLE_NEWLINE)
        )
        return self.atoms


class RecursiveChunker:
    """chunk_size/min_chunk_size/chunk_overlap semantics of the
    reference RecursiveChunker (regex path)."""

    def __init__(
        self,
        text: str,
        chunk_size: int,
        min_chunk_size: int | None = None,
        chunk_overlap: int = 0,
        separators: tuple[str, ...] = DEFAULT_SEPARATORS,
    ):
        self.full_text = text
        self.chunk_size = chunk_size
        # reference default: min(chunk_size/2, ...) is applied by the
        # op layer; here None → chunk_size // 2 like executor.rs does
        self.min_chunk_size = (
            min_chunk_size if min_chunk_size is not None else chunk_size // 2
        )
        self.chunk_overlap = chunk_overlap
        self.separators = [re.compile(s) for s in separators]

    # -- atom collection (recursion over the separator stack) -----------

    def _collect(self, start: int, end: int, sep_id: int,
                 collector: _AtomCollector) -> None:
        if sep_id >= len(self.separators):
            collector.collect(start, end)
            return
        collector.curr_level += 1
        text = self.full_text[start:end]
        pieces: list[tuple[int, int]] = []
        pos = start
        for m in self.separators[sep_id].finditer(text):
            pieces.append((pos, start + m.start()))
            pos = start + m.end()
        if pos < end:
            pieces.append((pos, end))
        for s, e in pieces:
            if e - s <= self.min_chunk_size:
                collector.collect(s, e)
            else:
                self._collect(s, e, sep_id + 1, collector)
        collector.curr_level -= 1
        if collector.curr_level < collector.min_level:
            collector.min_level = collector.curr_level

    # -- merge DP (:597-743) --------------------------------------------

    def _overlap_cost_base(self, offset: int) -> int:
        if self.chunk_overlap == 0:
            return 0
        return (
            (len(self.full_text) - offset) * MISSING_OVERLAP_COST
            // self.chunk_overlap
        )

    def _merge(self, atoms: list[_Atom]) -> list[tuple[int, int, str]]:
        # plans[p]: (start_idx, prev_plan_idx, cost, overlap_cost_base)
        plans: list[tuple[int, int, int, int]] = [
            (0, 0, 0, self._overlap_cost_base(0))
        ]
        gap_cost_cache = [0]

        def syntax_gap(boundary: int, internal) -> int:
            if boundary > internal:
                gap = boundary - internal
                while len(gap_cost_cache) <= gap:
                    i = len(gap_cost_cache)
                    gap_cost_cache.append(
                        gap_cost_cache[i - 1] + SYNTAX_LEVEL_GAP_COST // i
                    )
                return gap_cost_cache[gap]
            return 0

        def lb_gap(boundary: int, internal: int) -> int:
            return internal - boundary if boundary < internal else 0

        for i in range(len(atoms) - 1):
            chunk = atoms[i]
            min_cost: int | None = None
            arg_start = arg_prev = 0
            start_idx = i
            end_syntax = atoms[i + 1].boundary_syntax_level
            end_lb = atoms[i + 1].boundary_lb_level
            internal_syntax: float = float("inf")
            internal_lb = INLINE
            # min-heap (cost, -start_idx): ties pick the LARGEST
            # start_idx, mirroring Rust's BinaryHeap<(Reverse, usize)>
            heap: list[tuple[int, int]] = []
            while True:
                sc = atoms[start_idx]
                chunk_len = chunk.end - sc.start

                cost = 0
                cost += syntax_gap(sc.boundary_syntax_level, internal_syntax)
                cost += syntax_gap(end_syntax, internal_syntax)
                cost += (
                    lb_gap(sc.boundary_lb_level, internal_lb)
                    + lb_gap(end_lb, internal_lb)
                ) * PER_LINE_BREAK_LEVEL_GAP_COST
                if chunk_len < self.min_chunk_size:
                    cost += TOO_SMALL_CHUNK_COST

                if chunk_len > self.chunk_size:
                    if min_cost is None:
                        min_cost = cost + plans[start_idx][2]
                        arg_start = arg_prev = start_idx
                    break

                if self.chunk_overlap > 0:
                    while heap:
                        _tc, neg_idx = heap[0]
                        overlap_size = atoms[-neg_idx].end - sc.start
                        if overlap_size <= self.chunk_overlap:
                            break
                        heapq.heappop(heap)
                    heapq.heappush(
                        heap,
                        (plans[start_idx][2] + plans[start_idx][3], -start_idx),
                    )
                    prev_idx = -heap[0][1]
                else:
                    prev_idx = start_idx
                prev = plans[prev_idx]
                cost += prev[2]
                if self.chunk_overlap == 0:
                    cost += MISSING_OVERLAP_COST // 2
                else:
                    start_base = self._overlap_cost_base(sc.start)
                    if prev[3] < start_base:
                        cost += MISSING_OVERLAP_COST + prev[3] - start_base
                    else:
                        cost += MISSING_OVERLAP_COST
                if min_cost is None or cost < min_cost:
                    min_cost = cost
                    arg_start, arg_prev = start_idx, prev_idx

                if start_idx == 0:
                    break
                start_idx -= 1
                internal_syntax = min(
                    internal_syntax, sc.boundary_syntax_level
                )
                internal_lb = max(internal_lb, sc.internal_lb_level)

            plans.append(
                (arg_start, arg_prev, int(min_cost),
                 self._overlap_cost_base(chunk.end))
            )

        out: list[tuple[int, int, str]] = []
        plan_idx = len(plans) - 1
        while plan_idx > 0:
            start_idx, prev_idx, _c, _b = plans[plan_idx]
            s = atoms[start_idx].start
            e = atoms[plan_idx - 1].end
            out.append((s, e, self.full_text[s:e]))
            plan_idx = prev_idx
        out.reverse()
        return out

    def split(self) -> list[tuple[int, int, str]]:
        """→ [(start, end, text)] with text == full_text[start:end]."""
        collector = _AtomCollector(self.full_text)
        self._collect(0, len(self.full_text), 0, collector)
        return self._merge(collector.finish())


def split_recursively(
    text: str,
    chunk_size: int,
    min_chunk_size: int | None = None,
    chunk_overlap: int = 0,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[tuple[int, int, str]]:
    return RecursiveChunker(
        text, chunk_size, min_chunk_size, chunk_overlap, separators
    ).split()
