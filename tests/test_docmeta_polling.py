"""Canonical-description / metadata-extraction contract hooks and the
poll-for-changes source adapter."""

import os
import time

import pandas as pd
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators.docmeta import (
    canonical_descriptions, extract_document_metadata, metadata_udf_hook,
)
from cocoindex_data_ingestion_spark.plans.incremental import (
    BucketedParquetState,
)
from cocoindex_data_ingestion_spark.sources.polling import PollingSource


def test_canonical_descriptions_contract(spark):
    mentions = spark.createDataFrame(
        [
            ("Spark", "TECHNOLOGY", "uses Spark for batch processing"),
            ("spark", "TECHNOLOGY", "spark powers   the\npipeline"),
            ("Qdrant", "DATABASE", "Qdrant stores vectors"),
        ],
        "text string, type string, context string",
    )
    rows = {r.name: r for r in canonical_descriptions(mentions).collect()}
    assert set(rows) == {"spark", "qdrant"}
    # evidence dedup + whitespace normalization; default double is
    # evidence-grounded: name (TYPE): first snippet
    assert rows["spark"].n_evidence == 2
    assert rows["spark"].description.startswith("spark (TECHNOLOGY): Mention:")
    assert "\n" not in rows["spark"].description
    assert len(rows["qdrant"].description) <= 280

    # custom describe hook (the LLM plug-in point)
    def upper_fn(batch: pd.DataFrame) -> pd.Series:
        return batch["name"].str.upper()

    custom = {
        r.name: r.description
        for r in canonical_descriptions(mentions, describe_fn=upper_fn).collect()
    }
    assert custom["spark"] == "SPARK"

    # previous descriptions survive when an entity has no new evidence
    prev = spark.createDataFrame(
        [("nope", "old words")], "entity_id string, description string"
    )
    out = canonical_descriptions(mentions, previous=prev).collect()
    assert all(r.description for r in out)


def test_extract_document_metadata_fields(spark):
    docs = spark.createDataFrame(
        [
            (1, "Pipeline Deploy Guide\nDeploy the pipeline with the api. "
                "Deploy steps are easy and great. pipeline pipeline"),
            (2, "bad failure\nerror and problem everywhere, difficult fix"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in extract_document_metadata(docs).collect()}
    assert rows[1].title == "Pipeline Deploy Guide"
    assert rows[1].category == "engineering"
    assert rows[1].sentiment == "positive"
    assert rows[1].tags[0] == "pipeline"  # most frequent content token
    assert rows[1].confidence == 1.0
    assert rows[2].sentiment == "negative"
    assert rows[2].category in ("support", "engineering")
    assert rows[3].confidence < 1.0 and rows[3].tags == []

    # full-record LLM hook with the 9-field DocumentMetadata schema
    def fake_llm(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "title": ["T"] * len(texts),
                "author": ["a"] * len(texts),
                "department": [None] * len(texts),
                "category": ["engineering"] * len(texts),
                "tags": [["x"]] * len(texts),
                "summary": ["s"] * len(texts),
                "key_topics": [["k"]] * len(texts),
                "sentiment": ["neutral"] * len(texts),
                "confidence": [0.9] * len(texts),
            }
        )

    hooked = metadata_udf_hook(docs, fake_llm).collect()
    assert len(hooked) == 3 and hooked[0].author == "a"


def test_polling_source_change_capture(spark, tmp_path):
    """The GoogleDrive/Notion-shaped poll loop: add → process,
    modify → process, unchanged → skip, delete → delete."""
    src = tmp_path / "remote"
    src.mkdir()
    (src / "a.txt").write_text("doc a v1")
    (src / "b.txt").write_text("doc b v1")

    source = PollingSource(
        spark, str(src), str(tmp_path / "state"), include_glob="*.txt"
    )
    target = BucketedParquetState(
        spark, str(tmp_path / "target"),
        "_key string, n_chars long", key_col="_key",
    )

    def transform(df):
        return df.select(
            F.col("path").alias("_key"),
            F.length("content_text").cast("long").alias("n_chars"),
        )

    s1 = source.poll(transform, target)
    assert s1["processed"] == 2 and s1["deleted"] == 0

    # unchanged second poll: all skipped
    s2 = source.poll(transform, target)
    assert s2 == {"processed": 0, "bumped": 0, "skipped": 2, "deleted": 0}

    # modify one (bump mtime forward), delete one, add one
    time.sleep(0.05)
    (src / "a.txt").write_text("doc a version two!")
    os.utime(src / "a.txt", (time.time() + 2, time.time() + 2))
    (src / "b.txt").unlink()
    (src / "c.txt").write_text("doc c v1")

    s3 = source.poll(transform, target)
    assert s3["processed"] == 2  # a (modified) + c (new)
    assert s3["deleted"] == 1    # b gone

    res = {r._key.rsplit("/", 1)[-1]: r.n_chars for r in target.read().collect()}
    assert set(res) == {"a.txt", "c.txt"}
    assert res["a.txt"] == len("doc a version two!")
