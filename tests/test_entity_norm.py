"""Entity/relationship normalization tests mirroring the reference's
tables (entity_extraction_runner_v2.py:361-567 normalize_entity_type,
app/utils/relationship_types.py canonicalize_relationship_type, and
the :1880-1951 offset adjustment loop)."""

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.entity_norm import (
    ALLOWED_ENTITY_TYPES,
    RELATIONSHIP_TYPES_CANONICAL,
    canonicalize_relationship_type,
    normalize_entity_type,
    normalize_for_alignment,
    realign_mentions,
)


def _norm_types(spark, cases):
    df = spark.createDataFrame(
        [(i, rt, mt) for i, (rt, mt, _exp) in enumerate(cases)],
        "id int, raw_type string, mention string",
    )
    got = {
        r.id: r.t
        for r in df.select(
            "id", normalize_entity_type("raw_type", "mention").alias("t")
        ).collect()
    }
    return [got[i] for i in range(len(cases))]


def test_entity_type_vocabulary_sizes():
    assert len(ALLOWED_ENTITY_TYPES) == 19
    assert len(RELATIONSHIP_TYPES_CANONICAL) == 20


def test_normalize_entity_type_reference_cases(spark):
    cases = [
        ("PERSON", "", "PERSON"),                 # allowed passthrough
        ("person", "", "PERSON"),                 # case fold
        ("Noun-Phrase", "", "CONCEPT"),           # dash→_ then synonym
        ("noun phrase", "", "CONCEPT"),           # space→_ then synonym
        ("ACTION", "", "PROCEDURE"),
        ("process", "", "PROCEDURE"),
        ("SYMPTOM", "", "PROBLEM"),
        ("malfunction", "", "PROBLEM"),
        ("EQUIPMENT", "", "TOOL"),
        ("SUPPLY", "", "MATERIAL"),
        ("CONSUMABLE", "", "MATERIAL"),
        # keyword hints (dict order: MATERIAL before TOOL before ...)
        ("junk", "lint-free cloth", "MATERIAL"),
        (None, "torx screwdriver", "TOOL"),
        (None, "ribbon cable", "COMPONENT"),
        # 'screen flicker' hits both COMPONENT and PROBLEM keyword
        # lists; COMPONENT is earlier in the hint table and must win
        (None, "screen flicker", "COMPONENT"),
        (None, "citric acid", "CHEMICAL"),
        (None, "completely unrelated", "CONCEPT"),
        (None, None, "CONCEPT"),
    ]
    assert _norm_types(spark, cases) == [c[2] for c in cases]


def test_canonicalize_relationship_reference_cases(spark):
    cases = [
        ("may cause", "CAUSES"),
        ("cause", "CAUSES"),
        ("helps prevent", "MITIGATES"),
        ("prevents removal of", "MITIGATES"),
        ("prevents", "PREVENTS"),
        ("reduces", "MITIGATES"),
        ("used to clean", "USES"),
        ("contains", "COMPONENT_OF"),
        ("located in", "COMPONENT_OF"),
        ("located_in", "COMPONENT_OF"),
        ("noise amplified when", "IMPACTS"),
        ("supports", "RESPONSIBLE_FOR"),
        # sanitized upper-snake membership
        ("depends on", "DEPENDS_ON"),
        ("Component Of", "COMPONENT_OF"),
        ("Compatible-With", "COMPATIBLE_WITH"),
        ("  owned by  ", "OWNED_BY"),
        ("measures", "MEASURES"),
        # default
        ("", "RELATES_TO"),
        (None, "RELATES_TO"),
        ("gibberish label", "RELATES_TO"),
        ("requires", "RELATES_TO"),  # not in the canonical vocabulary
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _e) in enumerate(cases)], "id int, label string"
    )
    got = {
        r.id: r.t
        for r in df.select(
            "id", canonicalize_relationship_type("label").alias("t")
        ).collect()
    }
    assert [got[i] for i in range(len(cases))] == [e for _s, e in cases]


def test_normalize_for_alignment_dashes_nbsp(spark):
    df = spark.createDataFrame(
        [("en–dash em—dash nb sp minus−x",)], "s string"
    )
    out = df.select(normalize_for_alignment("s").alias("n")).collect()[0].n
    assert out == "en-dash em-dash nb sp minus-x"


def test_realign_mentions_all_paths(spark):
    text = "The panel–mount bracket holds the Display Assembly firmly."
    rows = [
        # verbatim: correct offsets
        ("d1", text, "bracket", 16, 23),
        # normalized: claimed span covers 'panel–mount' (en dash), the
        # LLM returned the ASCII-dash surface
        ("d1", text, "panel-mount", 4, 15),
        # relocated: offsets wrong, exact surface exists elsewhere
        ("d1", text, "Display Assembly", 0, 16),
        # relocated_ci: wrong case + wrong offsets
        ("d1", text, "display assembly", 0, 16),
        # unalignable: dropped
        ("d1", text, "flux capacitor", 0, 14),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, text string, mention string, "
        "start_offset int, end_offset int"
    )
    out = {
        (r.mention): (r.align, r.start_offset, r.end_offset)
        for r in realign_mentions(df).collect()
    }
    assert out["bracket"] == ("verbatim", 16, 23)
    assert out["panel-mount"] == ("normalized", 4, 15)
    assert out["Display Assembly"] == ("relocated", text.index("Display"), text.index("Display") + 16)
    assert out["display assembly"] == (
        "relocated_ci", text.lower().index("display assembly"),
        text.lower().index("display assembly") + 16,
    )
    assert "flux capacitor" not in out
    # range contract: realigned spans reproduce the mention (modulo
    # normalization/case, per reference semantics)
    for r in realign_mentions(df).collect():
        seg = text[r.start_offset:r.end_offset]
        if r.align == "verbatim":
            assert seg == r.mention
        elif r.align in ("normalized", "relocated"):
            assert seg.translate(
                str.maketrans("‐‑‒–—− ",
                              "------ ")
            ) == r.mention.translate(
                str.maketrans("‐‑‒–—− ",
                              "------ ")
            )
        else:
            assert seg.lower() == r.mention.lower()
