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

    Global ordering via zipWithIndex-free window over the given sort
    keys (deterministic when the keys are)."""
    from pyspark.sql import Window

    w = Window.orderBy(*[F.col(c) for c in order_by])
    return df.withColumn(pos_col, F.row_number().over(w) - 1)


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
