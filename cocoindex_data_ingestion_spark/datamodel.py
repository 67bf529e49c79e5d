"""Type system + table-kind contracts (SURVEY §1.1).

Reference: every value type is Basic | Struct | Table
(src/base/schema.rs:216-224); tables come in three kinds
(UTable/KTable/LTable, schema.rs:141-147); keys are restricted to a
subset of types (src/base/value.rs:85-94); `Range` is a
(start, end) byte-offset pair used as chunk key (schema.rs:39).

This module is the declared mapping onto Spark's type system plus
the runtime contracts Spark doesn't enforce natively:

- KTable: key uniqueness (validated);
- LTable: explicit ``_pos`` order column (Spark rows are unordered);
- Range: ``struct<start:bigint, end:bigint>`` helpers;
- key-type restriction mirrors the reference's KeyValue set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ValueType → Spark DataType (SURVEY §1.1 table; names are the
# reference's, src/base/schema.rs:21-66)
TYPE_MAPPING: dict[str, T.DataType] = {
    "Bytes": T.BinaryType(),
    "Str": T.StringType(),
    "Bool": T.BooleanType(),
    "Int64": T.LongType(),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "Range": T.StructType(
        [
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
        ]
    ),
    "Uuid": T.StringType(),  # canonical hex form
    "Date": T.DateType(),
    "Time": T.LongType(),  # nanos-of-day; Spark has no time type
    "LocalDateTime": T.TimestampNTZType(),
    "OffsetDateTime": T.TimestampType(),
    "TimeDelta": T.DayTimeIntervalType(),
    "Json": T.StringType(),  # + get_json_object / from_json
    "Vector": T.ArrayType(T.FloatType()),
}

# key-eligible types (src/base/value.rs:85-94): Bytes/Str/Bool/
# Int64/Range/Uuid/Date (+ structs of those)
KEYABLE_TYPES = ("Bytes", "Str", "Bool", "Int64", "Range", "Uuid", "Date")


def spark_type(ref_type: str) -> T.DataType:
    if ref_type not in TYPE_MAPPING:
        raise KeyError(f"unknown reference type '{ref_type}'")
    return TYPE_MAPPING[ref_type]


def is_keyable(ref_type: str) -> bool:
    return ref_type in KEYABLE_TYPES


def make_range(start: Column | int, end: Column | int) -> Column:
    """Range value (chunk-location key semantics, schema.rs:39)."""
    s = F.lit(start) if isinstance(start, int) else start
    e = F.lit(end) if isinstance(end, int) else end
    return F.struct(s.cast("long").alias("start"), e.cast("long").alias("end"))


def range_slice(text: Column | str, rng: Column) -> Column:
    """Recover the text a Range points at — the chunker consistency
    contract (split_recursively.rs:1049-1071)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.substring(
        t, (rng["start"] + 1).cast("int"), (rng["end"] - rng["start"]).cast("int")
    )


def validate_ktable(df: DataFrame, key_cols: list[str]) -> None:
    """KTable contract: rows unique by key (schema.rs:144)."""
    dupes = df.groupBy(*key_cols).count().filter("count > 1").limit(1).count()
    if dupes:
        raise ValueError(f"KTable key {key_cols} is not unique")


def as_ltable(df: DataFrame, order_by: list[str], pos_col: str = "_pos") -> DataFrame:
    """LTable: attach the explicit position column Spark needs to
    preserve list order (schema.rs:147; SURVEY §7 'LTable order').

    Scale-safe zipWithIndex shape (NOT a global no-partition window,
    which would move the whole table to one partition): range-
    repartition on the sort keys so partition order == global order,
    freeze partition ids with a lazy localCheckpoint, compute each
    partition's row count (one row per partition — bounded), turn
    those into broadcast cumulative offsets, and add a PER-PARTITION
    row_number. pos = partition_offset + local_rank. Deterministic
    when the sort keys are unique, like the reference's list order."""
    from pyspark.sql import Window

    cols = [F.col(c) for c in order_by]
    ordered = (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("_ltable_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ordered.groupBy("_ltable_pid").agg(F.count("*").alias("_n"))
    # window over #partitions rows — bounded by cluster size, not data
    w_off = (
        Window.orderBy("_ltable_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_ltable_pid",
        F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off"),
    )
    w_local = Window.partitionBy("_ltable_pid").orderBy(*cols)
    return (
        ordered.join(F.broadcast(offsets), "_ltable_pid")
        .withColumn(
            pos_col, (F.row_number().over(w_local) - 1 + F.col("_off")).cast("long")
        )
        .drop("_ltable_pid", "_off")
    )


def nest_table(
    df: DataFrame, parent_keys: list[str], pos_col: str | None = "_pos"
) -> DataFrame:
    """Re-nest a flat child table into array-of-struct per parent —
    the inverse of ForEach's explode (order restored from pos_col
    when present)."""
    child_cols = [c for c in df.columns if c not in parent_keys]
    if pos_col and pos_col in child_cols:
        # pos first in the struct: array_sort orders by first field
        child_cols = [pos_col] + [c for c in child_cols if c != pos_col]
    collected = df.groupBy(*parent_keys).agg(
        F.collect_list(F.struct(*child_cols)).alias("_rows")
    )
    if pos_col and pos_col in child_cols:
        collected = collected.withColumn("_rows", F.array_sort(F.col("_rows")))
    return collected


# -- Python annotation → Spark type inference ---------------------------------
# The reference SDK maps Python type annotations to engine types for
# the custom-function surface (python/cocoindex/typing.py, 458 LoC:
# dataclasses/NamedTuples → Struct, list → Table/Vector, Optional →
# nullable; convert.py round-trips values). Spark's own
# DataType.fromDDL can't see dataclasses, so this is the part that
# needs porting for `@op`-style typed UDFs to declare their schema
# from annotations alone.

import dataclasses
import datetime
import sys
import types as _pytypes
import typing
import uuid as _uuid

_SCALARS: dict[type, T.DataType] = {
    bytes: T.BinaryType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    int: T.LongType(),          # Int64 is the reference's only int
    float: T.DoubleType(),
    datetime.date: T.DateType(),
    datetime.datetime: T.TimestampType(),
    datetime.timedelta: T.DayTimeIntervalType(),
    _uuid.UUID: T.StringType(),  # canonical hex, like TYPE_MAPPING
}


def spark_type_of(tp) -> tuple[T.DataType, bool]:
    """(DataType, nullable) for a Python type annotation.

    Rules (typing.py parity): ``Optional[X]``/``X | None`` → nullable;
    ``list[X]`` → ArrayType (``list[float]`` is how Vector is
    declared, matching TYPE_MAPPING's elem type discipline);
    ``dict[K, V]`` → MapType; dataclasses and NamedTuples → Struct
    with per-field nullability; bare ``list``/``dict`` are rejected
    (the engine's types are fully static, schema.rs:216)."""
    origin = typing.get_origin(tp)
    args = typing.get_args(tp)

    if origin in (typing.Union, _pytypes.UnionType):
        non_none = [a for a in args if a is not type(None)]
        if len(non_none) != 1:
            raise TypeError(
                f"untagged multi-type Union not supported: {tp!r}"
                " (the reference widens or tags; declare explicitly)"
            )
        inner, _ = spark_type_of(non_none[0])
        return inner, True

    if origin in (list, typing.List):
        if not args:
            raise TypeError("bare list needs an element annotation")
        elem, elem_null = spark_type_of(args[0])
        return T.ArrayType(elem, containsNull=elem_null), False

    if origin in (dict, typing.Dict):
        if len(args) != 2:
            raise TypeError("bare dict needs key/value annotations")
        kt, _ = spark_type_of(args[0])
        vt, v_null = spark_type_of(args[1])
        return T.MapType(kt, vt, valueContainsNull=v_null), False

    if dataclasses.is_dataclass(tp):
        hints = typing.get_type_hints(tp)
        fields = []
        for f in dataclasses.fields(tp):
            ft, f_null = spark_type_of(hints[f.name])
            fields.append(T.StructField(f.name, ft, f_null))
        return T.StructType(fields), False

    if isinstance(tp, type) and issubclass(tp, tuple) and hasattr(tp, "_fields"):
        hints = typing.get_type_hints(tp)
        fields = []
        for name in tp._fields:
            ft, f_null = spark_type_of(hints[name])
            fields.append(T.StructField(name, ft, f_null))
        return T.StructType(fields), False

    for py, dt in _SCALARS.items():
        if tp is py:
            return dt, False

    raise TypeError(f"no Spark mapping for annotation {tp!r}")


def struct_type_of(tp) -> T.StructType:
    """StructType of a dataclass/NamedTuple (top-level rows)."""
    dt, _ = spark_type_of(tp)
    if not isinstance(dt, T.StructType):
        raise TypeError(f"{tp!r} is not a struct-like type")
    return dt


def return_type_of(fn) -> tuple[T.DataType, bool]:
    """Infer a UDF's Spark return type from its annotation — the
    reference's `analyze()` resolution (op.py): the declared Python
    return type IS the engine output type."""
    hints = typing.get_type_hints(fn)
    if "return" not in hints:
        raise TypeError(f"{fn.__name__} needs a return annotation")
    return spark_type_of(hints["return"])


def typed_udf(fn, vectorized: bool = False):
    """`@op`-surface helper: a UDF whose returnType comes from the
    function's return annotation (pandas_udf when ``vectorized`` —
    the Arrow path — else a scalar udf for struct-returning fns)."""
    dt, _ = return_type_of(fn)
    if vectorized:
        return F.pandas_udf(dt)(fn)
    return F.udf(fn, dt)


def dataclasses_to_df(spark, items, cls) -> DataFrame:
    """Rows from dataclass instances with the schema inferred from
    the class (convert.py's Python→engine direction). UUIDs become
    canonical hex, nested dataclasses become structs, lists of
    dataclasses become array<struct>."""

    def _to_plain(v):
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return tuple(
                _to_plain(getattr(v, f.name)) for f in dataclasses.fields(v)
            )
        if isinstance(v, _uuid.UUID):
            return str(v)
        if isinstance(v, list):
            return [_to_plain(x) for x in v]
        if isinstance(v, dict):
            return {k: _to_plain(x) for k, x in v.items()}
        return v

    schema = struct_type_of(cls)
    return spark.createDataFrame([_to_plain(i) for i in items], schema)


def df_to_dataclasses(df: DataFrame, cls) -> list:
    """collect() back into dataclass instances (engine→Python).
    Inverse of :func:`dataclasses_to_df` for roundtrip-able types
    (UUID fields come back as their canonical-hex string form, the
    declared engine representation)."""
    hints = typing.get_type_hints(cls)

    def _from_row(row, tp):
        if dataclasses.is_dataclass(tp):
            h = typing.get_type_hints(tp)
            return tp(**{
                f.name: _from_row(row[f.name], h[f.name])
                for f in dataclasses.fields(tp)
            })
        origin = typing.get_origin(tp)
        args = typing.get_args(tp)
        if origin in (typing.Union, _pytypes.UnionType):
            inner = [a for a in args if a is not type(None)][0]
            return None if row is None else _from_row(row, inner)
        if origin in (list, typing.List):
            return [_from_row(x, args[0]) for x in (row or [])]
        if origin in (dict, typing.Dict):
            return {k: _from_row(v, args[1]) for k, v in (row or {}).items()}
        return row

    return [
        cls(**{
            name: _from_row(r[name], hints[name])
            for name in (f.name for f in dataclasses.fields(cls))
        })
        for r in df.collect()
    ]
