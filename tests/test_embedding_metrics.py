"""EmbeddingService parity bits (embedding_service.py:29-43,101-103,
197-238): similarity metric trio + cost accounting constants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.similarity import (
    cosine_sim,
    dot,
    euclidean_sim,
)
from cocoindex_data_ingestion_spark.operators.embedding import (
    EMBEDDING_MODELS,
    TOKENS_PER_WORD_EST,
)


def test_metric_trio_known_answers(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [3.0, 4.0]), ([1.0, 0.0], [1.0, 0.0])],
        "a array<double>, b array<double>",
    )
    rows = df.select(
        cosine_sim("a", "b").alias("c"),
        euclidean_sim("a", "b").alias("e"),
        dot("a", "b").alias("d"),
    ).collect()
    # zero-norm vector → cosine 0 (null-safe), euclidean 1/(1+5)
    assert rows[0]["c"] == 0.0
    assert rows[0]["e"] == pytest.approx(1.0 / 6.0)
    assert rows[0]["d"] == 0.0
    # identical unit vectors
    assert rows[1]["c"] == pytest.approx(1.0)
    assert rows[1]["e"] == pytest.approx(1.0)
    assert rows[1]["d"] == pytest.approx(1.0)


def test_cost_estimator_matches_reference_formula(spark):
    txt = "one two three four"
    df = spark.createDataFrame([(txt,)], "text string")
    toks = df.select(
        (F.size(F.split(F.trim(F.col("text")), r"\s+"))
         * F.lit(TOKENS_PER_WORD_EST)).alias("t")
    ).first()["t"]
    assert toks == pytest.approx(len(txt.split()) * 1.3)
    price = EMBEDDING_MODELS["text-embedding-3-small"]["price_per_1k_tokens"]
    assert toks / 1000 * price == pytest.approx(4 * 1.3 / 1000 * 0.00002)


def test_model_table_verbatim():
    # embedding_service.py:29-43
    assert EMBEDDING_MODELS["text-embedding-3-large"]["dimensions"] == 3072
    assert EMBEDDING_MODELS["text-embedding-ada-002"][
        "price_per_1k_tokens"
    ] == 0.00010
    assert set(EMBEDDING_MODELS) == {
        "text-embedding-3-small",
        "text-embedding-3-large",
        "text-embedding-ada-002",
    }


def test_llm_cost_table_and_unknown_model(spark):
    from pyspark.sql import functions as F
    from cocoindex_data_ingestion_spark.operators.extract import (
        LLM_PRICING,
        llm_cost_estimate,
    )

    df = spark.createDataFrame(
        [
            ("openai", "gpt-4o", 2000.0, 1000.0),
            ("gemini", "gemini-2.0-flash-lite", 1000.0, 0.0),
            ("openai", "gpt-9-nano", 5000.0, 5000.0),
            ("gemini", "gpt-4o", 1000.0, 1000.0),  # wrong provider → 0
        ],
        "p string, m string, pt double, ct double",
    )
    got = [
        r["c"]
        for r in df.select(
            llm_cost_estimate(
                F.col("p"), F.col("m"), F.col("pt"), F.col("ct")
            ).alias("c")
        ).collect()
    ]
    assert got[0] == pytest.approx(2 * 0.005 + 1 * 0.015)
    assert got[1] == pytest.approx(0.0001)
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert LLM_PRICING["openai"]["gpt-3.5-turbo"]["output"] == 0.0015
