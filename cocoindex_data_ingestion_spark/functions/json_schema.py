"""JSON Schema builder for structured LLM output (ExtractByLlm core).

Reference behavior: ``build_json_schema`` (src/base/json_schema.rs:
55-354) converts the declared output type into the JSON Schema that
drives the LLM's structured-output mode, plus a value extractor that
unwraps the ``{"value": ...}`` object the schema adds when the top
level isn't a struct; ``ExtractByLlm`` (src/ops/functions/
extract_by_llm.rs:53-70) wires that schema into the system prompt.

Spark-first: the declared output type IS a Spark ``DataType`` (what a
DataFrame column carries), so this module maps ``DataType`` → JSON
Schema with the reference's exact conventions:

- string/binary → string; boolean → boolean; integral → integer;
  float/double/decimal → number
- date / timestamp / day-time interval → string with the reference's
  format + description texts (date, date-time, duration)
- array → array-of-items; struct → object with
  ``additionalProperties: false`` and ``required`` = non-nullable
  fields (``fields_always_required`` forces all fields required and
  widens nullable fields to ``[T, "null"]``)
- the repo's Range struct (start/end bigint) → the reference's
  2-element integer array with its description
- non-struct top level under ``top_level_must_be_object`` → wrapped
  in ``{"value": ...}`` with an extractor that unwraps it

``extract_structured`` is the operator half: parse the LLM's JSON
text column against the declared type with ``from_json`` (JVM-side),
unwrap, and flag rows that failed to parse — the deterministic part
of ExtractByLlm; the model call itself is the usual external pandas
UDF hook (operators/embedding shape).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RANGE_DESC = (
    "A range represented by a list of two positions, start pos "
    "(inclusive), end pos (exclusive)."
)
_DATE_DESC = "A date in YYYY-MM-DD format, e.g. 2025-03-27"
_DATETIME_DESC = (
    "Date time without timezone offset in YYYY-MM-DDTHH:MM:SS format, "
    "e.g. 2025-03-27T13:32:12"
)
_OFFSET_DATETIME_DESC = (
    "Date time with timezone offset in RFC3339, e.g. "
    "2025-03-27T13:32:12Z, 2025-03-27T07:32:12.313-06:00"
)
_DURATION_DESC = (
    "A duration, e.g. 'PT1H2M3S' (ISO 8601) or '1 day 2 hours 3 seconds'"
)


@dataclass
class ToJsonSchemaOptions:
    """Mirror of json_schema.rs ToJsonSchemaOptions: different LLM
    APIs have different structured-output dialects."""

    fields_always_required: bool = False
    supports_format: bool = True
    top_level_must_be_object: bool = False


def _is_range_struct(dt: T.DataType) -> bool:
    return (
        isinstance(dt, T.StructType)
        and [f.name for f in dt.fields] == ["start", "end"]
        and all(isinstance(f.dataType, T.LongType) for f in dt.fields)
    )


def _for_type(dt: T.DataType, opts: ToJsonSchemaOptions) -> dict:
    if _is_range_struct(dt):
        return {
            "type": "array",
            "items": {"type": "integer"},
            "minItems": 2,
            "maxItems": 2,
            "description": _RANGE_DESC,
        }
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return {"type": "string"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": "integer"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.DateType):
        out = {"type": "string", "description": _DATE_DESC}
        if opts.supports_format:
            out["format"] = "date"
        return out
    if isinstance(dt, T.TimestampNTZType):
        out = {"type": "string", "description": _DATETIME_DESC}
        if opts.supports_format:
            out["format"] = "date-time"
        return out
    if isinstance(dt, T.TimestampType):
        out = {"type": "string", "description": _OFFSET_DATETIME_DESC}
        if opts.supports_format:
            out["format"] = "date-time"
        return out
    if isinstance(dt, T.DayTimeIntervalType):
        out = {"type": "string", "description": _DURATION_DESC}
        if opts.supports_format:
            out["format"] = "duration"
        return out
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "items": _for_type(dt.elementType, opts),
        }
    if isinstance(dt, T.StructType):
        return _for_struct(dt, opts)
    # MapType / variant / anything json-shaped: no constraint
    return {}


def _for_struct(st: T.StructType, opts: ToJsonSchemaOptions) -> dict:
    props = {}
    required = []
    for f in st.fields:
        sub = _for_type(f.dataType, opts)
        if opts.fields_always_required and f.nullable:
            if "type" in sub:
                t = sub["type"]
                sub["type"] = (t if isinstance(t, list) else [t]) + ["null"]
        if opts.fields_always_required or not f.nullable:
            required.append(f.name)
        if "description" not in sub and f.metadata.get("description"):
            sub["description"] = f.metadata["description"]
        props[f.name] = sub
    return {
        "type": "object",
        "properties": props,
        "required": required,
        "additionalProperties": False,
    }


@dataclass
class BuildJsonSchemaOutput:
    schema: dict
    object_wrapper_field_name: str | None


def build_json_schema(
    output_type: T.DataType,
    options: ToJsonSchemaOptions | None = None,
) -> BuildJsonSchemaOutput:
    """Declared Spark output type → (JSON Schema, wrapper-field name)
    — json_schema.rs:320-354 semantics including the ``value``
    object-wrapper for non-struct top levels."""
    opts = options or ToJsonSchemaOptions()
    if opts.top_level_must_be_object and not isinstance(
        output_type, T.StructType
    ):
        wrapper = T.StructType(
            [T.StructField("value", output_type, nullable=True)]
        )
        return BuildJsonSchemaOutput(
            _for_struct(wrapper, opts), "value"
        )
    return BuildJsonSchemaOutput(_for_type(output_type, opts), None)


def get_system_prompt(
    instruction: str | None = None,
    extra_instructions: str | None = None,
) -> str:
    """extract_by_llm.rs:25-51 system-prompt assembly."""
    message = (
        "You are extracting structured information from text. "
        "Respond ONLY with JSON matching the provided schema."
    )
    if instruction:
        message += "\n\n" + instruction
    if extra_instructions:
        message += "\n\n" + extra_instructions
    return message


def extract_structured(
    df: DataFrame,
    json_col: Column | str,
    output_type: T.DataType,
    options: ToJsonSchemaOptions | None = None,
    out_col: str = "extracted",
) -> DataFrame:
    """Parse an LLM's JSON output column against the declared type —
    the deterministic back half of ExtractByLlm. JVM-side
    ``from_json``; unparseable rows get ``{out_col} IS NULL`` and
    ``{out_col}_error = true`` (the reference surfaces the parse
    error per row). Wrapper unwrapping matches the schema builder."""
    opts = options or ToJsonSchemaOptions()
    built = build_json_schema(output_type, opts)
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    if built.object_wrapper_field_name:
        wrapper = T.StructType(
            [T.StructField(
                built.object_wrapper_field_name, output_type, True
            )]
        )
        parsed = F.from_json(c, wrapper)[built.object_wrapper_field_name]
    else:
        parsed = F.from_json(c, output_type)
    # PERMISSIVE from_json null-fills malformed rows instead of
    # returning null — probe validity via a corrupt-record column
    probe = F.from_json(
        c,
        T.StructType([T.StructField("_corrupt_record", T.StringType(), True)]),
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    error = F.when(c.isNull(), F.lit(False)).otherwise(
        probe["_corrupt_record"].isNotNull()
    )
    return df.withColumn(
        out_col, F.when(error, F.lit(None).cast(output_type)).otherwise(parsed)
    ).withColumn(f"{out_col}_error", error)
