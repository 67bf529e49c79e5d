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


def test_spark_type_of_annotations():
    """typing.py parity: annotations → Spark types with nullability."""
    import dataclasses
    import datetime
    import typing
    import uuid

    from pyspark.sql import types as T

    from cocoindex_data_ingestion_spark.datamodel import (
        return_type_of, spark_type_of, struct_type_of,
    )

    assert spark_type_of(int) == (T.LongType(), False)
    assert spark_type_of(typing.Optional[str]) == (T.StringType(), True)
    assert spark_type_of(float | None) == (T.DoubleType(), True)
    assert spark_type_of(list[float]) == (
        T.ArrayType(T.DoubleType(), False), False,
    )
    assert spark_type_of(dict[str, int]) == (
        T.MapType(T.StringType(), T.LongType(), False), False,
    )
    assert spark_type_of(uuid.UUID) == (T.StringType(), False)
    assert spark_type_of(datetime.datetime) == (T.TimestampType(), False)

    @dataclasses.dataclass
    class Chunk:
        location: str
        start: int
        text: str | None
        embedding: list[float]

    st = struct_type_of(Chunk)
    assert [f.name for f in st.fields] == [
        "location", "start", "text", "embedding",
    ]
    assert st["text"].nullable and not st["start"].nullable
    assert isinstance(st["embedding"].dataType, T.ArrayType)

    # nested dataclasses + list-of-struct (the KTable-returning fn shape)
    @dataclasses.dataclass
    class Doc:
        doc_id: int
        chunks: list[Chunk]

    dt, _ = spark_type_of(Doc)
    assert isinstance(dt["chunks"].dataType.elementType, T.StructType)

    def chunker(text: str) -> list[Chunk]:  # pragma: no cover - annotation only
        raise NotImplementedError

    rt, _ = return_type_of(chunker)
    assert isinstance(rt, T.ArrayType) and isinstance(rt.elementType, T.StructType)

    import pytest as _pytest

    with _pytest.raises(TypeError):
        spark_type_of(list)
    with _pytest.raises(TypeError):
        spark_type_of(typing.Union[int, str])


def test_typed_udf_roundtrip(spark):
    """A struct-returning annotated UDF declares its schema from the
    annotation and round-trips values (convert.py parity)."""
    import dataclasses

    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.datamodel import typed_udf

    @dataclasses.dataclass
    class Span:
        start: int
        end: int
        text: str | None

    def locate(s: str) -> Span:
        i = s.find("x")
        return Span(start=i, end=i + 1, text=s[i:i + 1] if i >= 0 else None)

    u = typed_udf(locate)
    df = spark.createDataFrame([("axb",), ("no",)], "s string")
    rows = df.select(u(F.col("s")).alias("span")).collect()
    assert rows[0]["span"]["start"] == 1 and rows[0]["span"]["text"] == "x"
    assert rows[1]["span"]["start"] == -1 and rows[1]["span"]["text"] is None


def test_dataclass_df_roundtrip(spark):
    """convert.py parity: dataclass instances → DataFrame (inferred
    schema) → dataclass instances, including nested structs, arrays
    of structs, optional fields, and UUID canonical-hex."""
    import dataclasses
    import uuid

    from cocoindex_data_ingestion_spark.datamodel import (
        dataclasses_to_df, df_to_dataclasses,
    )

    @dataclasses.dataclass
    class Mention:
        text: str
        start: int
        conf: float | None

    @dataclasses.dataclass
    class DocRow:
        doc_id: int
        run_id: str  # UUID hex (declared engine repr)
        mentions: list[Mention]
        tags: dict[str, int]

    rows = [
        DocRow(1, str(uuid.uuid5(uuid.NAMESPACE_DNS, "a")),
               [Mention("x", 0, 0.9), Mention("y", 5, None)], {"k": 1}),
        DocRow(2, str(uuid.uuid5(uuid.NAMESPACE_DNS, "b")), [], {}),
    ]
    df = dataclasses_to_df(spark, rows, DocRow)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "run_id", "mentions", "tags",
    ]
    back = sorted(df_to_dataclasses(df, DocRow), key=lambda r: r.doc_id)
    assert back == rows
