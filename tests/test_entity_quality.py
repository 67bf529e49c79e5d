"""EntityQualityValidator exact port (utils/entity_quality.py):
validity raise order, score factors, relationship rescues, MATERIAL
bias."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import entity_quality as eq


def _annot(spark, rows):
    df = spark.createDataFrame(
        rows, "name string, type string, conf double, rel long"
    )
    out = eq.annotate_should_keep(
        df, F.col("name"), F.col("type"), F.col("conf"), F.col("rel")
    )
    return {r["name"]: r.asDict() for r in out.collect()}


def test_validity_raise_order_quirks(spark):
    got = _annot(
        spark,
        [
            ("it", None, 0.5, 0),     # 'IT' is a KNOWN acronym → VALID
            ("this", None, 0.5, 0),   # pronoun
            ("xy", None, 0.5, 0),     # too_short
            ("what happened here", None, 0.5, 0),  # question_phrase
            ("was broken", None, 0.5, 0),          # verb_phrase
            ("issue", None, 0.5, 0),               # generic_term
            ("process", "procedure", 1.0, 0),      # DOMAIN exception → valid
            ("a b c d e f g h i j", None, 0.5, 0),  # 10 words → fragment
            ("review today", None, 0.5, 0),        # temporal
            ("123 45", None, 0.5, 0),              # pure_number
        ],
    )
    assert got["it"]["invalid_reason"] == ""
    assert got["this"]["invalid_reason"] == "pronoun"
    assert got["xy"]["invalid_reason"] == "too_short"
    assert got["what happened here"]["invalid_reason"] == "question_phrase"
    assert got["was broken"]["invalid_reason"] == "verb_phrase"
    assert got["issue"]["invalid_reason"] == "generic_term"
    assert got["process"]["invalid_reason"] == ""
    assert got["a b c d e f g h i j"]["invalid_reason"] == (
        "sentence_fragment"
    )
    assert got["review today"]["invalid_reason"] == "temporal_reference"
    assert got["123 45"]["invalid_reason"] == "pure_number"


def test_score_factors_match_reference_arithmetic(spark):
    got = _annot(
        spark,
        [
            ("API", "component", 0.5, 0),
            ("process", "procedure", 1.0, 0),
            ("power supply", "other", 0.9, 1),
        ],
    )
    # API: acro 1.5×, len<5-but-acro branch: len(3)<5 → 0.7×,
    # specific type 1.2× → 0.5*1.5*0.7*1.2 = 0.63
    assert got["API"]["quality_score"] == pytest.approx(
        0.5 * 1.5 * 0.7 * 1.2
    )
    assert got["API"]["keep"] is True
    # 'process' validates via DOMAIN_EXCEPTIONS but the score's
    # generic penalty has NO exception escape → 1.0*0.3*1.2 = 0.36
    assert got["process"]["quality_score"] == pytest.approx(0.36)
    assert got["process"]["keep"] is False
    assert got["process"]["quality_reason"] == "low_quality"
    # 2-word bonus 1.2×, rel bonus 1.1×, generic type 0.8×
    assert got["power supply"]["quality_score"] == pytest.approx(
        0.9 * 1.2 * 1.1 * 0.8
    )


def test_relationship_rescues(spark):
    got = _annot(
        spark,
        [
            ("was broken", None, 0.9, 5),  # invalid + ≥5 rels → kept @0.5
            ("was down", None, 0.9, 4),    # invalid + 4 rels → filtered
            ("tiny", "concept", 0.1, 3),   # valid, low score, ≥3 → kept
        ],
    )
    j = got["was broken"]
    assert j["keep"] is True and j["quality_score"] == 0.5
    assert j["quality_reason"] == (
        "kept_despite_verb_phrase_due_to_relationships"
    )
    assert got["was down"]["keep"] is False
    k = got["tiny"]
    assert k["keep"] is True
    assert k["quality_reason"] == "kept_for_relationships"


def test_material_bias(spark):
    df = spark.createDataFrame(
        [
            ("microfiber cloth", "TOOL"),
            ("applicator tool wipe", "TOOL"),
            ("wipes", "MATERIAL"),
            ("hammer", "TOOL"),
        ],
        "name string, type string",
    )
    got = {
        r["name"]: r["b"]
        for r in df.select(
            "name", eq.material_bias(F.col("name"), F.col("type")).alias("b")
        ).collect()
    }
    assert got["microfiber cloth"] == "MATERIAL"
    assert got["applicator tool wipe"] == "TOOL"   # counter-signal
    assert got["wipes"] == "MATERIAL"
    assert got["hammer"] == "TOOL"


def test_filter_entities_relationship_counts(spark):
    ents = spark.createDataFrame(
        [
            ("e1", "was broken", "state", 0.9),
            ("e2", "power supply", "component", 0.9),
        ],
        "entity_id string, name string, type string, confidence double",
    )
    rels = spark.createDataFrame(
        [("r%d" % i, "e1", "e2") for i in range(5)],
        "rel_id string, source_entity_id string, target_entity_id string",
    )
    out = {
        r["entity_id"]: r.asDict()
        for r in eq.filter_entities(ents, rels).collect()
    }
    assert out["e1"]["relationship_count"] == 5
    assert out["e1"]["keep"] is True  # rescued despite verb_phrase
    assert out["e2"]["keep"] is True
