"""Type-mapping + table-kind contract tests (SURVEY §1.1)."""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark import datamodel as dm


def test_type_mapping_complete():
    for t in ("Bytes", "Str", "Bool", "Int64", "Float32", "Float64",
              "Range", "Uuid", "Date", "Time", "LocalDateTime",
              "OffsetDateTime", "TimeDelta", "Json", "Vector"):
        assert dm.spark_type(t) is not None
    with pytest.raises(KeyError):
        dm.spark_type("Nope")
    assert dm.is_keyable("Range") and dm.is_keyable("Uuid")
    assert not dm.is_keyable("Float64") and not dm.is_keyable("Vector")


def test_range_roundtrip(spark):
    df = spark.createDataFrame([("hello world",)], "text string").select(
        "text", dm.make_range(6, 11).alias("loc")
    )
    row = df.select(dm.range_slice("text", F.col("loc")).alias("s")).collect()[0]
    assert row.s == "world"


def test_ktable_validation(spark):
    ok = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dm.validate_ktable(ok, ["k"])
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k long, v string")
    with pytest.raises(ValueError, match="not unique"):
        dm.validate_ktable(dup, ["k"])


def test_ltable_nest_roundtrip(spark):
    flat = spark.createDataFrame(
        [(1, "c", 2), (1, "a", 0), (1, "b", 1), (2, "x", 0)],
        "doc long, val string, ord long",
    )
    lt = dm.as_ltable(flat, order_by=["doc", "ord"])
    nested = dm.nest_table(lt.drop("ord"), parent_keys=["doc"])
    rows = {r.doc: [x["val"] for x in r._rows] for r in nested.collect()}
    assert rows[1] == ["a", "b", "c"]  # order restored from _pos
    assert rows[2] == ["x"]
