"""Metadata tag taxonomy: regex/vocabulary tag enrichment + categorization.

Reference behavior (faithful port, Spark-first):
- ``TagTaxonomy`` (app/models/metadata_taxonomy.py:68-163): the hybrid
  tag vocabulary — product models, components, issues, actions,
  compliance standards, priorities — and ``categorize_tag`` (:146-163),
  which buckets a tag by a fixed priority order: exact product-model
  match, then case-insensitive component/issue/action, then exact
  compliance, then case-insensitive priority, else ``custom``.
- Pattern-matching enrichment (app/services/metadata_extraction.py):
  ``extract_product_models`` (:17-34 — ``\\bNC\\d{4}\\b`` /
  ``\\bPC\\d{4}\\b`` / ``\\bSM\\d{3}\\b``), ``extract_components``
  (:37-48 — word-boundary vocabulary match on lowercased content),
  ``extract_issues`` (:51-70 — each hyphenated issue also matches its
  space-joined and compressed spellings), and
  ``combine_and_deduplicate_tags`` (:73-114 — LLM tags first, then
  products/components/issues; dedup by lowercased-stripped value
  keeping the FIRST occurrence; keep original casing only for tags
  matching ``^[A-Z]+\\d+``; sort by (product, component, issue,
  other) class then tag; cap at 15). The reference carries a second,
  refactored copy of the same four helpers as
  ``app/services/metadata_extraction_service.py:57-117``
  (``_regex_product_models`` / ``_regex_components`` /
  ``_regex_issues`` / ``_merge_tags``) — semantically identical,
  covered by this same port.

Spark-first: everything is pure JVM expressions — per-term literal
regex ``WHEN`` arms (each pattern compiled once, whole-stage codegen)
build the candidate arrays in ONE projection; the combine/dedup/sort
loop becomes two row_number windows partitioned by document. No UDFs.

Scale: candidates per document are bounded by the vocabulary size
(+ model matches), so both windows run over tiny per-doc groups after
a single hash exchange on the document key — no skew, no global sort,
linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# --------------------------------------------------------------- vocabularies
# metadata_taxonomy.py:72-131 (verbatim vocabularies; parameters cited)

PRODUCT_MODELS = [
    "NC2050", "NC2068", "NC3000", "NC3100", "NC4000",
    "PC1000", "PC2000", "PC3000",
    "SM100", "SM200", "SM300",
]

COMPONENTS = [
    "display", "screen", "lcd", "led", "oled",
    "power-supply", "psu", "battery", "adapter",
    "motherboard", "mainboard", "cpu", "processor",
    "memory", "ram", "storage", "ssd", "hdd",
    "cooling-system", "fan", "heatsink", "thermal",
    "ports", "usb", "hdmi", "ethernet", "audio",
    "keyboard", "touchpad", "mouse", "input-device",
    "firmware", "bios", "driver", "software",
    "operating-system", "os", "application",
]

ISSUES = [
    "screen-flickering", "dead-pixels", "backlight-failure",
    "color-distortion", "brightness-issue", "no-display",
    "no-power", "power-cycling", "battery-drain",
    "charging-issue", "overheating",
    "slow-performance", "freezing", "crashing",
    "boot-failure", "blue-screen", "kernel-panic",
    "network-issue", "wifi-problem", "bluetooth-issue",
    "connection-drop", "port-failure",
]

ACTIONS = [
    "troubleshooting", "maintenance", "calibration",
    "replacement", "upgrade", "installation",
    "configuration", "optimization", "diagnostic",
    "repair", "cleaning", "testing",
]

COMPLIANCE = [
    "ISO-9001", "ISO-27001", "CE", "FCC", "RoHS",
    "UL", "ETL", "Energy-Star", "GDPR", "HIPAA",
]

PRIORITY = [
    "critical", "high-priority", "urgent",
    "normal", "low-priority", "scheduled",
]

# metadata_extraction.py:21-31 — model-series patterns
MODEL_PATTERNS = [r"\bNC\d{4}\b", r"\bPC\d{4}\b", r"\bSM\d{3}\b"]

# combine_and_deduplicate_tags:114 — output cap
MAX_TAGS = 15

# re.match(r'^[A-Z]+\d+', tag) (metadata_extraction.py:98,105) —
# prefix semantics: both Java regex find and DuckDB regexp_matches
# are substring searches, so the ^ anchor reproduces re.match.
_MODEL_CASE_RE = r"^[A-Z]+[0-9]+"


def _issue_pattern(issue: str) -> str:
    """extract_issues (:56-68): an issue term matches its hyphenated,
    space-joined, or compressed spelling, word-bounded."""
    alts = {issue, issue.replace("-", " "), issue.replace("-", "")}
    return r"\b(" + "|".join(sorted(alts)) + r")\b"


def extract_product_models(text_col: Column) -> Column:
    """Array of model mentions in match order (NC, then PC, then SM
    series — metadata_extraction.py:17-34 extend order). The
    reference's ``list(set(...))`` dedup is order-unstable and
    observationally irrelevant: the combine step re-dedups by
    lowercase and the final sort is total, so match order suffices."""
    return F.concat(
        *[F.regexp_extract_all(text_col, F.lit(p), 0) for p in MODEL_PATTERNS]
    )


def extract_components(text_col: Column) -> Column:
    """Vocabulary-order array of component terms present with word
    boundaries in the lowercased text (metadata_extraction.py:37-48).
    One literal-pattern WHEN arm per term: patterns compile once,
    the whole array is a single codegen projection."""
    lt = F.lower(text_col)
    return F.array_compact(
        F.array(
            *[
                F.when(lt.rlike(rf"\b{t.lower()}\b"), F.lit(t))
                for t in COMPONENTS
            ]
        )
    )


def extract_issues(text_col: Column) -> Column:
    """Vocabulary-order array of issue terms whose any spelling
    variation matches (metadata_extraction.py:51-70)."""
    lt = F.lower(text_col)
    return F.array_compact(
        F.array(
            *[
                F.when(lt.rlike(_issue_pattern(t.lower())), F.lit(t))
                for t in ISSUES
            ]
        )
    )


def categorize_tag_col(tag: Column) -> Column:
    """``TagTaxonomy.categorize_tag`` (metadata_taxonomy.py:146-163):
    fixed priority order; product/compliance membership is
    case-SENSITIVE, the rest compare lowercased."""
    lt = F.lower(tag)
    return (
        F.when(tag.isin(PRODUCT_MODELS), F.lit("product"))
        .when(lt.isin([t.lower() for t in COMPONENTS]), F.lit("component"))
        .when(lt.isin([t.lower() for t in ISSUES]), F.lit("issue"))
        .when(lt.isin([t.lower() for t in ACTIONS]), F.lit("action"))
        .when(tag.isin(COMPLIANCE), F.lit("compliance"))
        .when(lt.isin([t.lower() for t in PRIORITY]), F.lit("priority"))
        .otherwise(F.lit("custom"))
    )


def _tagged(src: int, arr: Column) -> Column:
    """Annotate an array's elements with (source order, position)."""
    return F.transform(
        arr,
        lambda x, i: F.struct(
            F.lit(src).alias("src"), i.alias("pos"), x.alias("tag")
        ),
    )


def taxonomy_tags(
    docs: DataFrame,
    text_col: str = "text",
    llm_tags_col: str | None = None,
    id_cols: tuple[str, ...] = ("doc_id",),
    max_tags: int = MAX_TAGS,
) -> DataFrame:
    """The full enrichment pipeline of
    ``metadata_extraction.combine_and_deduplicate_tags`` (:73-114)
    over ``extract_product_models``/``extract_components``/
    ``extract_issues`` plus caller-supplied LLM tags.

    Returns one row per kept tag: ``(*id_cols, tag_pos, tag,
    tag_class, tag_category)`` where ``tag_pos`` is the 1-based rank
    in the reference's final sorted order, ``tag_class`` the sort
    class (0 product-shaped, 1 component, 2 issue, 3 other —
    :104-112), and ``tag_category`` the ``categorize_tag`` bucket.

    Dedup keeps the FIRST occurrence in (llm, products, components,
    issues) order by lowercased-stripped value (:89-101); the kept
    spelling is the original only when it matches ``^[A-Z]+\\d+``,
    else the lowercased-stripped form.
    """
    text = F.col(text_col)
    llm = F.col(llm_tags_col) if llm_tags_col else F.array().cast("array<string>")
    cand = F.concat(
        _tagged(0, llm),
        _tagged(1, extract_product_models(text)),
        _tagged(2, extract_components(text)),
        _tagged(3, extract_issues(text)),
    )
    ids = [F.col(c) for c in id_cols]
    rows = (
        docs.select(*ids, F.explode(cand).alias("c"))
        .select(*ids, F.col("c.src").alias("src"),
                F.col("c.pos").alias("pos"), F.col("c.tag").alias("tag"))
        .withColumn("norm", F.trim(F.lower(F.col("tag"))))
        .filter(F.col("norm") != "")
    )
    # First-occurrence-per-norm via lag over ONE doc-keyed window:
    # ordering by (norm, src, pos) groups each norm's rows
    # contiguously, so "first occurrence in (src, pos) order" is
    # exactly "norm differs from the previous row" — and both this
    # window and the rank window below share the same partitioning
    # key, so the whole pipeline runs on a single exchange
    # (guide §2.4) instead of one exchange per window. Ordering is
    # total within (doc, norm): (src, pos) is unique per candidate.
    w_seq = Window.partitionBy(*id_cols).orderBy("norm", "src", "pos")
    kept = (
        rows.withColumn("_prev_norm", F.lag("norm").over(w_seq))
        .filter(
            F.col("_prev_norm").isNull()
            | (F.col("_prev_norm") != F.col("norm"))
        )
        .withColumn(
            "out_tag",
            F.when(F.col("tag").rlike(_MODEL_CASE_RE), F.col("tag"))
            .otherwise(F.col("norm")),
        )
        .withColumn(
            "tag_class",
            F.when(F.col("out_tag").rlike(_MODEL_CASE_RE), F.lit(0))
            .when(F.col("out_tag").isin(COMPONENTS), F.lit(1))
            .when(F.col("out_tag").isin(ISSUES), F.lit(2))
            .otherwise(F.lit(3)),
        )
    )
    w_rank = Window.partitionBy(*id_cols).orderBy(
        "tag_class", "out_tag", "norm"
    )
    return (
        kept.withColumn("tag_pos", F.row_number().over(w_rank))
        .filter(F.col("tag_pos") <= max_tags)
        .select(
            *id_cols,
            "tag_pos",
            F.col("out_tag").alias("tag"),
            "tag_class",
            categorize_tag_col(F.col("out_tag")).alias("tag_category"),
        )
    )
