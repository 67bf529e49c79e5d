"""Entity quality validation — exact port of the reference's
``EntityQualityValidator`` (app/utils/entity_quality.py) plus the
mention-filter MATERIAL bias (entity_extraction_runner_v2.py:862-871).

All pure expressions (one codegen CASE chain per check, evaluated in
the reference's raise order), so validation/scoring of a 100 TB
entity table is a single scan; the relationship-count rescue needs
one groupBy over the (far smaller) relationship table broadcast back.

Float determinism: ``calculate_quality_score`` multiplies literal
factors in the reference's statement order — the oracle replays the
SAME multiplication sequence, so IEEE results are bit-identical
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# entity_quality.py:19-36 (verbatim)
GENERIC_STOPWORDS = [
    'issue', 'problem', 'solution', 'system', 'process', 'data',
    'information', 'status', 'error', 'result', 'update', 'change',
    'last', 'first', 'next', 'current', 'new', 'old', 'previous',
    'thing', 'stuff', 'item', 'object', 'element', 'part',
    'way', 'method', 'approach', 'technique',
    'yesterday', 'today', 'tomorrow', 'now', 'then', 'later',
    'earlier', 'before', 'after', 'recently', 'soon',
    'it', 'this', 'that', 'these', 'those', 'them', 'they',
    'he', 'she', 'we', 'you', 'i', 'me', 'us',
    'some', 'any', 'all', 'none', 'each', 'every',
    'one', 'two', 'three', 'many', 'few', 'several', 'various',
    'different', 'same', 'other', 'another',
]

# :39-57
VERB_INDICATORS = [
    'did', 'does', 'doing', 'done', 'do',
    'was', 'were', 'been', 'being', 'be', 'is', 'are', 'am',
    'has', 'have', 'had', 'having',
    'will', 'would', 'could', 'should', 'might', 'may', 'can',
    'causing', 'caused', 'causes', 'cause',
    'making', 'made', 'makes', 'make',
    'going', 'went', 'goes', 'go',
    'coming', 'came', 'comes', 'come',
    'getting', 'got', 'gets', 'get',
    'taking', 'took', 'takes', 'take',
    'giving', 'gave', 'gives', 'give',
    'using', 'used', 'uses', 'use',
    'finding', 'found', 'finds', 'find',
    'working', 'worked', 'works', 'work',
    'trying', 'tried', 'tries', 'try',
    'need', 'needs', 'needed', 'needing',
    'want', 'wants', 'wanted', 'wanting',
]

# :60-63
QUESTION_INDICATORS = [
    'what', 'where', 'when', 'why', 'how', 'who', 'whom', 'which',
    'whose', 'whether', 'wherever', 'whenever',
]

# :66-80
KNOWN_ACRONYMS = [
    'API', 'UI', 'UX', 'URL', 'URI', 'HTML', 'CSS', 'JSON', 'XML',
    'SQL', 'CPU', 'GPU', 'RAM', 'ROM', 'SSD', 'HDD', 'USB', 'HDMI',
    'LED', 'LCD', 'OLED', 'PCB', 'IC', 'AC', 'DC', 'RF', 'EMI',
    'CEO', 'CTO', 'CFO', 'VP', 'HR', 'IT', 'QA', 'QC',
    'RCA', 'CAPA', 'SOP', 'KPI', 'ROI', 'TCO', 'SLA',
    'ERP', 'CRM', 'SCM', 'BPM', 'BI',
    'ISO', 'IEEE', 'ANSI', 'DIN', 'JIS',
    'USA', 'UK', 'EU', 'UN', 'WHO', 'FDA', 'EPA', 'FCC',
    'GPS', 'PDF', 'ZIP', 'FTP', 'HTTP', 'HTTPS', 'SMTP',
]

# :83-91
DOMAIN_EXCEPTIONS = [
    'firmware', 'software', 'hardware', 'database', 'server',
    'client', 'user', 'admin', 'administrator', 'operator',
    'sensor', 'actuator', 'controller', 'processor',
    'configuration', 'setting', 'parameter', 'variable',
    'interface', 'protocol', 'standard', 'specification',
    'procedure', 'process', 'workflow', 'inspection', 'cleaning',
    'de-airing', 'tank', 'chlorine', 'visit', 'maintenance',
]

TEMPORAL_WORDS = [
    'yesterday', 'today', 'tomorrow', 'now', 'then', 'later', 'earlier',
]  # :144

PRONOUNS = ['it', 'this', 'that', 'these', 'those', 'them', 'they']  # :120

# entity_extraction_runner_v2.py:864-870 — substring containment, not
# word-boundary
MATERIAL_TERMS = [
    'cloth', 'towel', 'paper towel', 'shop towel', 'microfiber',
    'micro-fiber', 'micro fibre', 'wipe', 'wipes', 'wiping',
    'pad', 'pads', 'lint-free', 'lint free',
]
MATERIAL_COUNTER_TERMS = [
    'applicator tool', 'applicator-tip', 'applicator tip',
    'specialized tool', 'equipment',
]

SPECIFIC_TYPES = ['component', 'procedure', 'specification',
                  'organization', 'person']  # :212
GENERIC_TYPES = ['concept', 'other', 'state']  # :217

MIN_QUALITY_SCORE = 0.4  # should_keep_entity default (:230)


def _arr(vals: list[str]) -> Column:
    """One ArrayType literal (not N literal children) — keeps the
    codegen for 60-term vocabularies small enough to stay JIT'd."""
    return F.lit(vals)


def _member(col: Column, vals: list[str]) -> Column:
    return F.array_contains(_arr(vals), col)


def _words(name: Column) -> Column:
    lo = F.lower(F.trim(name))
    return F.when(F.length(lo) == 0, F.array().cast("array<string>")).otherwise(
        F.split(lo, r"\s+")
    )


def invalid_reason(
    name: Column, lo: Column | None = None, words: Column | None = None
) -> Column:
    """``is_valid_entity`` (:94-152) — the FIRST failing check's
    reason, or '' when valid (empty string == valid, as the
    reference's tuple). Pass precomputed ``lo``/``words`` columns to
    keep the expression tree small (the split would otherwise be
    re-inlined once per check and blow codegen method limits)."""
    lo = F.lower(F.trim(name)) if lo is None else lo
    words = _words(name) if words is None else words
    no_space = F.regexp_replace(lo, " ", "")
    return (
        F.when(name.isNull() | (F.trim(name) == ""), F.lit("empty_name"))
        .when(_member(F.upper(name), KNOWN_ACRONYMS), F.lit(""))
        .when(F.length(lo) < 3, F.lit("too_short"))
        .when(_member(lo, PRONOUNS), F.lit("pronoun"))
        .when(
            F.arrays_overlap(words, _arr(QUESTION_INDICATORS)),
            F.lit("question_phrase"),
        )
        .when(
            _member(F.element_at(words, 1), VERB_INDICATORS),
            F.lit("verb_phrase"),
        )
        .when(
            _member(lo, GENERIC_STOPWORDS)
            & ~_member(lo, DOMAIN_EXCEPTIONS)
            & (F.size(words) == 1),
            F.lit("generic_term"),
        )
        .when(F.size(words) > 9, F.lit("sentence_fragment"))
        .when(
            F.arrays_overlap(words, _arr(TEMPORAL_WORDS)),
            F.lit("temporal_reference"),
        )
        .when(
            (F.length(no_space) > 0) & no_space.rlike("^[0-9]+$"),
            F.lit("pure_number"),
        )
        .otherwise(F.lit(""))
    )


def quality_score(
    name: Column,
    entity_type: Column,
    confidence: Column,
    relationship_count: Column,
    lo: Column | None = None,
    words: Column | None = None,
) -> Column:
    """``calculate_quality_score`` (:155-222): multiplicative factors
    in the reference's statement order, capped to [0, 1]."""
    lo = F.lower(F.trim(name)) if lo is None else lo
    words = _words(name) if words is None else words
    n_words = F.size(words)
    is_acro = _member(F.upper(name), KNOWN_ACRONYMS)
    # Left-associated FACTOR PRODUCT, not a chain of
    # when(c, score*f).otherwise(score): that shape duplicates the
    # running score in both branches of every stage (2^10 tree copies
    # — blew janino's 64 KB method limit). x * 1.0 == x bit-exactly
    # for finite IEEE doubles, so `conf * f1 * ... * f9` in the
    # reference's statement order is arithmetically IDENTICAL to the
    # sequential conditional multiplies.
    one = F.lit(1.0)
    factors = [
        F.when(is_acro, F.lit(1.5)).otherwise(one),
        F.when((F.length(name) < 3) & ~is_acro, F.lit(0.3))
        .when(F.length(name) < 5, F.lit(0.7))
        .otherwise(one),
        F.when(_member(lo, GENERIC_STOPWORDS), F.lit(0.3)).otherwise(one),
        F.when(
            (n_words > 0) & _member(F.element_at(words, 1), VERB_INDICATORS),
            F.lit(0.2),
        ).otherwise(one),
        F.when(
            F.arrays_overlap(words, _arr(QUESTION_INDICATORS)), F.lit(0.1)
        ).otherwise(one),
        F.when((n_words >= 2) & (n_words <= 3), F.lit(1.2)).otherwise(one),
        F.when(n_words > 5, F.lit(0.2)).otherwise(one),
        F.when(
            relationship_count > 0,
            1.0 + F.least(relationship_count.cast("double") * 0.1, F.lit(0.5)),
        ).otherwise(one),
        F.when(
            _member(F.lower(entity_type), SPECIFIC_TYPES), F.lit(1.2)
        ).otherwise(one),
        F.when(
            _member(F.lower(entity_type), GENERIC_TYPES), F.lit(0.8)
        ).otherwise(one),
    ]
    score = confidence.cast("double")
    for f in factors:
        score = score * f
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), score))


def annotate_should_keep(
    df: DataFrame,
    name: Column,
    entity_type: Column,
    confidence: Column,
    relationship_count: Column,
    min_quality_score: float = MIN_QUALITY_SCORE,
) -> DataFrame:
    """``should_keep_entity`` (:225-265): adds ``keep``,
    ``quality_score``, ``quality_reason`` — including the
    relationship rescues (invalid entities survive at score 0.5 with
    ≥5 relationships; low-quality valid ones with ≥3).

    Deliberately TWO projections: the validator and the score tree
    land once each as intermediate columns, and the three outputs
    reference those columns. Inlining them (one select) triples both
    trees, which pushed whole-stage codegen past janino's 64 KB
    method limit and forced interpreted fallback — CollapseProject
    keeps non-cheap multi-referenced aliases staged, so this form
    stays JIT'd."""
    staged = df.withColumns(
        {"__lo": F.lower(F.trim(name)), "__w": _words(name)}
    ).withColumns(
        {
            "__reason": invalid_reason(
                name, lo=F.col("__lo"), words=F.col("__w")
            ),
            "__qs": quality_score(
                name, entity_type, confidence, relationship_count,
                lo=F.col("__lo"), words=F.col("__w"),
            ),
            "__rel": relationship_count,
        }
    )
    reason, score = F.col("__reason"), F.col("__qs")
    rel = F.col("__rel")
    invalid = reason != ""
    keep = F.when(invalid, rel >= 5).otherwise(
        (score >= min_quality_score) | (rel >= 3)
    )
    out_score = (
        F.when(invalid & (rel >= 5), F.lit(0.5))
        .when(invalid, F.lit(0.0))
        .otherwise(score)
    )
    out_reason = (
        F.when(
            invalid & (rel >= 5),
            F.concat(
                F.lit("kept_despite_"), reason,
                F.lit("_due_to_relationships"),
            ),
        )
        .when(invalid, reason)
        .when(score >= min_quality_score, F.lit("good_quality"))
        .when(rel >= 3, F.lit("kept_for_relationships"))
        .otherwise(F.lit("low_quality"))
    )
    return (
        staged.withColumns(
            {
                "keep": keep,
                "quality_score": out_score,
                "quality_reason": out_reason,
                "invalid_reason": reason,
            }
        )
        .drop("__qs", "__rel", "__reason", "__lo", "__w")
    )


def material_bias(text: Column, entity_type: Column) -> Column:
    """The mention-filter MATERIAL override
    (entity_extraction_runner_v2.py:862-871): cloth/towel/pad/wipe
    vocabulary forces MATERIAL unless a strong tool counter-signal —
    SUBSTRING containment, faithfully."""
    lx = F.lower(F.coalesce(text, F.lit("")))
    has_term = None
    for w in MATERIAL_TERMS:
        cond = lx.contains(F.lit(w))
        has_term = cond if has_term is None else (has_term | cond)
    has_counter = None
    for w in MATERIAL_COUNTER_TERMS:
        cond = lx.contains(F.lit(w))
        has_counter = cond if has_counter is None else (has_counter | cond)
    return F.when(
        (entity_type != "MATERIAL") & has_term & ~has_counter,
        F.lit("MATERIAL"),
    ).otherwise(entity_type)


def filter_entities(
    entities: DataFrame,
    relationships: DataFrame | None = None,
    min_quality_score: float = MIN_QUALITY_SCORE,
    id_col: str = "entity_id",
    name_col: str = "name",
    type_col: str = "type",
    conf_col: str = "confidence",
) -> DataFrame:
    """``filter_entities`` (:267-324): per-entity relationship counts
    (source + target occurrences) → should_keep → annotated table
    with quality_score / quality_reason / keep. One aggregate over
    the relationship table + one join; the validator itself is a
    single scan."""
    if relationships is not None:
        counts = (
            relationships.select(
                F.explode(
                    F.array(
                        F.col("source_entity_id"), F.col("target_entity_id")
                    )
                ).alias(id_col)
            )
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__rel_count"))
        )
        ann = entities.join(counts, id_col, "left").withColumn(
            "__rel_count", F.coalesce(F.col("__rel_count"), F.lit(0))
        )
    else:
        ann = entities.withColumn("__rel_count", F.lit(0))
    out = annotate_should_keep(
        ann, F.col(name_col), F.col(type_col), F.col(conf_col),
        F.col("__rel_count"), min_quality_score,
    )
    return out.withColumnRenamed("__rel_count", "relationship_count")
