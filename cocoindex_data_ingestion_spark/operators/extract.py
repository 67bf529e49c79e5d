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

from cocoindex_data_ingestion_spark.functions.parallel import spread_python_stage

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

    raw = spread_python_stage(
        docs.select(id_col, text_col), id_col
    ).mapInPandas(run, raw_schema)
    out = extract_structured(
        raw, "_raw_json", output_type, opts, out_col="extracted"
    )
    return out.drop("_raw_json")


# -- LLM call cost estimation (llm_service.py:396-428) -------------------------

# pricing per 1K tokens (verbatim table)
LLM_PRICING = {
    "openai": {
        "gpt-4o": {"input": 0.005, "output": 0.015},
        "gpt-4o-mini": {"input": 0.00015, "output": 0.0006},
        "gpt-4-turbo-preview": {"input": 0.01, "output": 0.03},
        "gpt-3.5-turbo": {"input": 0.0005, "output": 0.0015},
    },
    "gemini": {
        "gemini-2.5-pro": {"input": 0.0035, "output": 0.0105},
        "gemini-2.5-flash": {"input": 0.00035, "output": 0.00105},
        "gemini-2.0-flash": {"input": 0.00025, "output": 0.00075},
        "gemini-2.0-flash-lite": {"input": 0.0001, "output": 0.0003},
        "gemini-1.5-pro": {"input": 0.0035, "output": 0.0105},
        "gemini-1.5-flash": {"input": 0.00035, "output": 0.00105},
    },
}


def llm_cost_estimate(provider, model, prompt_tokens, completion_tokens):
    """``LLMService._estimate_cost`` (:396-428): per-1K-token pricing
    by (provider, model); unknown pairs cost 0.0. Pure expression —
    the per-call accounting column of a batch extraction ledger.
    (The reference rounds with Python's round(x, 6); callers round
    for output with the engine-stable ``stable_round``.)"""
    from pyspark.sql import functions as F

    p = prompt_tokens.cast("double") / 1000
    c = completion_tokens.cast("double") / 1000
    cost = F.lit(0.0)
    for prov, models in LLM_PRICING.items():
        for m, rates in models.items():
            cost = F.when(
                (provider == prov) & (model == m),
                p * rates["input"] + c * rates["output"],
            ).otherwise(cost)
    return cost
