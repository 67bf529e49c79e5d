"""JSON Schema builder + ExtractByLlm structured-output path
(reference src/base/json_schema.rs semantics)."""

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cocoindex_data_ingestion_spark.functions.json_schema import (
    ToJsonSchemaOptions, build_json_schema, extract_structured,
    get_system_prompt,
)
from cocoindex_data_ingestion_spark.operators.extract import extract_by_llm


ENTITY_TYPE = T.StructType([
    T.StructField("name", T.StringType(), nullable=False),
    T.StructField("type", T.StringType(), nullable=False),
    T.StructField("confidence", T.DoubleType(), nullable=True),
    T.StructField("mentions", T.ArrayType(T.StructType([
        T.StructField("text", T.StringType(), False),
        T.StructField("range", T.StructType([
            T.StructField("start", T.LongType(), False),
            T.StructField("end", T.LongType(), False),
        ]), False),
    ])), nullable=True),
])


def test_struct_schema_required_and_additional_properties():
    out = build_json_schema(ENTITY_TYPE)
    s = out.schema
    assert s["type"] == "object"
    assert s["additionalProperties"] is False
    assert s["required"] == ["name", "type"]  # non-nullable only
    assert s["properties"]["confidence"] == {"type": "number"}
    mentions = s["properties"]["mentions"]
    assert mentions["type"] == "array"
    # the Range struct maps to the reference's 2-int array form
    rng = mentions["items"]["properties"]["range"]
    assert rng["minItems"] == 2 and rng["maxItems"] == 2
    assert rng["items"] == {"type": "integer"}
    assert "start pos (inclusive)" in rng["description"]


def test_fields_always_required_widens_nullable():
    s = build_json_schema(
        ENTITY_TYPE, ToJsonSchemaOptions(fields_always_required=True)
    ).schema
    assert s["required"] == ["name", "type", "confidence", "mentions"]
    assert s["properties"]["confidence"]["type"] == ["number", "null"]


def test_temporal_formats_and_descriptions():
    st = T.StructType([
        T.StructField("d", T.DateType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("ntz", T.TimestampNTZType(), True),
    ])
    s = build_json_schema(st).schema
    assert s["properties"]["d"]["format"] == "date"
    assert "YYYY-MM-DD" in s["properties"]["d"]["description"]
    assert s["properties"]["ts"]["format"] == "date-time"
    assert "RFC3339" in s["properties"]["ts"]["description"]
    assert "without timezone" in s["properties"]["ntz"]["description"]
    # dialects without format support omit it
    nf = build_json_schema(
        st, ToJsonSchemaOptions(supports_format=False)
    ).schema
    assert "format" not in nf["properties"]["d"]


def test_top_level_wrapper_for_non_struct():
    out = build_json_schema(
        T.ArrayType(T.StringType()),
        ToJsonSchemaOptions(top_level_must_be_object=True),
    )
    assert out.object_wrapper_field_name == "value"
    assert out.schema["type"] == "object"
    assert out.schema["properties"]["value"]["type"] == "array"
    assert out.schema["required"] == []  # wrapper field is nullable


def test_extract_structured_parses_and_flags_errors(spark):
    df = spark.createDataFrame(
        [
            (1, '{"name": "Spark", "type": "TECHNOLOGY", "confidence": 0.9}'),
            (2, "this is not json"),
            (3, None),
        ],
        "doc_id long, raw string",
    )
    out = {
        r.doc_id: r
        for r in extract_structured(df, "raw", ENTITY_TYPE).collect()
    }
    assert out[1].extracted.name == "Spark"
    assert out[1].extracted_error is False
    assert out[2].extracted is None and out[2].extracted_error is True
    assert out[3].extracted is None and out[3].extracted_error is False


def test_extract_by_llm_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "Apache Spark is great"), (2, "")], "doc_id long, text string"
    )

    def fake_llm(texts: pd.Series, schema: dict) -> pd.Series:
        # a real impl posts (system prompt, schema, text); the fake
        # proves the schema reaches the hook and rows stay aligned
        assert schema["type"] == "object"
        return pd.Series(
            [
                json.dumps(
                    {"name": t.split()[1], "type": "TECHNOLOGY"}
                ) if t else "{}"
                for t in texts
            ]
        )

    out = {
        r.doc_id: r
        for r in extract_by_llm(docs, ENTITY_TYPE, llm_fn=fake_llm).collect()
    }
    assert out[1].extracted.name == "Spark"
    assert out[2].extracted.name is None
    assert not out[1].extracted_error

    prompt = get_system_prompt("Extract entities.")
    assert prompt.startswith("You are extracting structured")
    assert "Extract entities." in prompt
