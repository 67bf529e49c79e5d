"""App-model relationship registry (app/models/relationships.py):
the 14-type matrix, validate_entities, the get_entity_type keyword
heuristic, and the to_cypher_properties truthiness rules — pinned
against a faithful Python mirror of the reference logic."""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.relationship_model import (
    DEFAULT_ENTITY_TYPE,
    ENTITY_TYPE_KEYWORDS,
    REL_TYPES,
    entity_type_col,
    get_entity_type,
    rel_types_df,
    validate_entities_col,
)


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("relmodel-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


# -- registry shape (relationships.py:11-219) ---------------------------------


def test_registry_is_the_reference_14():
    assert len(REL_TYPES) == 14
    # spot-pin the matrix rows most likely to drift
    src, tgt, props = REL_TYPES["COMPONENT_OF"]
    assert src == ("Component", "Feature", "Module")
    assert tgt == ("Product", "System", "Component")
    assert len(props) == 4
    assert REL_TYPES["RELATES_TO"][0] == ("Any",)
    assert REL_TYPES["RELATES_TO"][1] == ("Any",)
    assert len(REL_TYPES["CONNECTS_TO"][2]) == 6
    assert len(REL_TYPES["TROUBLESHOOTS"][2]) == 6


# -- get_entity_type (relationships.py:306-341) --------------------------------


@pytest.mark.parametrize(
    "name,meta,expected",
    [
        ("Temperature Sensor", None, "Component"),
        ("x500 dispenser", None, "Product"),
        ("cloud PLATFORM", None, "Software"),
        # substring (not word-boundary) probes — 'app' in 'pineapple'
        ("pineapple", None, "Software"),
        # Department probes run BEFORE Document: 'marketing report'
        ("marketing report", None, "Department"),
        ("user manual", None, "Document"),
        ("mystery thing", None, DEFAULT_ENTITY_TYPE),
        # metadata override wins regardless of keywords
        ("temperature sensor", "Issue", "Issue"),
        # present-but-empty type returned verbatim (key-membership
        # check in the reference, not value truthiness)
        ("temperature sensor", "", ""),
    ],
)
def test_get_entity_type_python_twin(name, meta, expected):
    assert get_entity_type(name, meta) == expected


def test_entity_type_col_matches_python_twin(spark):
    names = [
        "temperature sensor", "x500", "firmware blob", "logistics hub",
        "spec sheet", "pineapple", "marketing report", "nothing here",
        "Supply Chain", "MODEL T", "keyboard",  # 'board' → Component
    ]
    metas = [None, "Custom", ""]
    rows = [
        (i * 10 + j, n, m)
        for i, n in enumerate(names)
        for j, m in enumerate(metas)
    ]
    df = spark.createDataFrame(rows, "id int, name string, meta string")
    got = {
        r["id"]: r["ty"]
        for r in df.select(
            "id", entity_type_col("name", "meta").alias("ty")
        ).collect()
    }
    for rid, n, m in rows:
        assert got[rid] == get_entity_type(n, m), (n, m)


def test_keyword_order_is_load_bearing():
    # the probe order must stay Product, Component, Software,
    # Department, Document — the reference returns on first hit
    assert [t for t, _ in ENTITY_TYPE_KEYWORDS] == [
        "Product", "Component", "Software", "Department", "Document",
    ]


# -- validate_entities (relationships.py:213-218) ------------------------------


def _py_validate(label: str, src: str, tgt: str) -> bool:
    srcs, tgts, _ = REL_TYPES[label]
    return ("Any" in srcs or src in srcs) and ("Any" in tgts or tgt in tgts)


def test_validate_entities_full_matrix(spark):
    """Exhaustive: every label × a type pool covering member,
    non-member, and wildcard-only types, Spark vs the Python rule."""
    pool = [
        "Product", "Component", "Software", "Document", "Department",
        "Issue", "Process", "Segment", "Market", "Customer", "Entity",
        "",
    ]
    cases = [
        (label, s, t)
        for label in REL_TYPES
        for s in pool
        for t in pool
    ]
    df = spark.createDataFrame(cases, "label string, s string, t string")
    joined = df.join(F.broadcast(rel_types_df(spark)), "label")
    got = joined.select(
        "label", "s", "t", validate_entities_col("s", "t").alias("ok")
    ).collect()
    assert len(got) == len(cases)
    for r in got:
        assert r["ok"] == _py_validate(r["label"], r["s"], r["t"]), (
            r["label"], r["s"], r["t"]
        )


def test_relates_to_accepts_anything(spark):
    df = spark.createDataFrame(
        [("RELATES_TO", "Weird", "")], "label string, s string, t string"
    ).join(F.broadcast(rel_types_df(spark)), "label")
    assert df.select(validate_entities_col("s", "t")).first()[0] is True
