"""Flow API contract tests (reference semantics: single assignment,
ForEach scoping, collector accumulation, stable auto-UUID, KTable
key contract, logic fingerprint)."""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.plans.flow import Flow, FlowError


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )


def test_single_assignment_enforced(spark):
    flow = Flow("t")
    scope = flow.add_source("docs", _docs(spark), key_cols=["doc_id"])
    scope.transform("n_chars", F.length("text"))
    with pytest.raises(FlowError, match="already assigned"):
        scope.transform("n_chars", F.length("text"))


def test_for_each_collect_roundtrip(spark):
    flow = Flow("t")
    df = _docs(spark).withColumn(
        "chunks",
        F.array(
            F.struct(F.lit(0).alias("idx"), F.col("text").alias("chunk_text"))
        ),
    )
    scope = flow.add_source("docs", df, key_cols=["doc_id"])
    scope.for_each(
        "chunks",
        lambda child: child.collect(
            "chunk_rows",
            {"doc_id": "doc_id", "idx": "idx", "chunk_text": "chunk_text"},
        ),
        keep_parent_fields=["doc_id"],
    )
    rows = flow.collector("chunk_rows").collect()
    assert {(r.doc_id, r.idx) for r in rows} == {(1, 0), (2, 0)}


def test_auto_uuid_stable_across_runs(spark):
    def build():
        flow = Flow("t")
        scope = flow.add_source("docs", _docs(spark), key_cols=["doc_id"])
        scope.collect(
            "out", {"doc_id": "doc_id", "text": "text"}, auto_uuid_field="id"
        )
        return {r.doc_id: r.id for r in flow.collector("out").collect()}

    first, second = build(), build()
    assert first == second  # fingerprint-keyed UUID reuse semantics
    assert all(len(u) == 36 for u in first.values())


def test_ktable_key_contract(spark):
    flow = Flow("t")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "doc_id long, text string")
    scope = flow.add_source("docs", dup, key_cols=["doc_id"])
    with pytest.raises(FlowError, match="not unique"):
        flow.validate_ktable(scope)


def test_logic_fingerprint_changes_with_definition(spark):
    f1, f2 = Flow("t"), Flow("t")
    s1 = f1.add_source("docs", _docs(spark), key_cols=["doc_id"])
    s2 = f2.add_source("docs", _docs(spark), key_cols=["doc_id"])
    s1.transform("a", F.length("text"))
    s2.transform("b", F.length("text"))
    assert f1.logic_fingerprint() != f2.logic_fingerprint()

    f3 = Flow("t")
    s3 = f3.add_source("docs", _docs(spark), key_cols=["doc_id"])
    s3.transform("a", F.length("text"))
    assert f1.logic_fingerprint() == f3.logic_fingerprint()


def test_export_requires_pk_columns(spark):
    flow = Flow("t")
    scope = flow.add_source("docs", _docs(spark), key_cols=["doc_id"])
    scope.collect("out", {"doc_id": "doc_id"})
    with pytest.raises(FlowError, match="pk fields missing"):
        flow.export("out", "target", primary_key=["nope"])


def test_naming_rules(spark):
    """Reference SDK naming validation (validation.py, issue #779
    rules; tests/test_validation.py grid): empty, too-long, '__'
    prefix, bad characters rejected at construction; dots allowed
    only in full flow names."""
    import pytest

    from cocoindex_data_ingestion_spark.functions.validation import (
        NamingError, check_field_name, check_full_flow_name,
    )
    from cocoindex_data_ingestion_spark.plans.flow import Flow

    Flow("valid_flow_1")
    with pytest.raises(NamingError):
        Flow("")
    with pytest.raises(NamingError):
        Flow("__reserved")
    with pytest.raises(NamingError):
        Flow("has space")
    with pytest.raises(NamingError):
        Flow("has.dot")  # dots only valid in FULL flow names
    with pytest.raises(NamingError):
        Flow("x" * 65)
    assert check_full_flow_name("ns.flow_a") == "ns.flow_a"
    # parity quirk: the reference's dotted pattern allows consecutive
    # dots after the first char; only empty/reserved/length/charset
    # rules apply
    check_full_flow_name("ns..")
    with pytest.raises(NamingError):
        check_full_flow_name(".starts_with_dot")

    f = Flow("f")
    src = f.add_source(
        "docs", spark.createDataFrame([(1, "a")], "id long, text string"), ["id"]
    )
    with pytest.raises(NamingError):
        src.transform("9bad", lambda df: df.id)
    with pytest.raises(NamingError):
        src.transform("__hidden", lambda df: df.id)
