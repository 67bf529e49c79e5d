"""End-to-end ingestion pipeline: process → review → approve →
publish → search, with state-machine enforcement."""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import state_machine
from cocoindex_data_ingestion_spark.pipelines import IngestionPipeline


def test_state_machine_transitions(spark):
    df = spark.createDataFrame(
        [(1, "discovered"), (2, "approved"), (3, "ingested")],
        "doc_id long, status string",
    )
    moved = state_machine.transition(df, "processing")
    got = {r.doc_id: (r.status, r._invalid_transition) for r in moved.collect()}
    assert got[1] == ("processing", False)     # allowed
    assert got[2] == ("approved", True)        # approved -/-> processing
    assert got[3] == ("ingested", True)        # terminal
    with pytest.raises(ValueError, match="invalid state transition"):
        state_machine.assert_no_invalid(moved)

    retry = state_machine.transition(
        spark.createDataFrame([(4, "failed")], "doc_id long, status string"),
        "processing",
    )
    state_machine.assert_no_invalid(retry)


def test_pipeline_end_to_end(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "Apache Spark reads data. Spark writes to Postgres."),
         (2, "Qdrant stores vectors. Postgres stores rows."),
         (3, "Nothing relevant appears in this one at all.")],
        "doc_id long, text string",
    )
    gaz = {"Spark": "TECHNOLOGY", "Postgres": "DATABASE", "Qdrant": "DATABASE"}
    pipe = IngestionPipeline(spark, str(tmp_path / "p"), gaz, embed_dim=16)

    stats = pipe.process(docs)
    assert stats["documents"] == 3 and stats["chunks"] >= 3
    assert stats["mentions"] >= 4
    states = {r.doc_id: r.status for r in pipe.docs_state.read().collect()}
    assert set(states.values()) == {"pending_review"}

    # approve only docs 1 and 2; publish
    pipe.approve([1, 2])
    out = pipe.publish()
    assert out["ingested"] == 2
    states = {r.doc_id: r.status for r in pipe.docs_state.read().collect()}
    assert states[1] == "ingested" and states[3] == "pending_review"

    # graph only contains entities from approved docs
    names = {r.name for r in pipe.graph.nodes.read().collect()}
    assert names == {"spark", "postgres", "qdrant"}
    assert out["edges"] >= 1

    # query-time search with the shared embedder finds the Spark chunk
    hits = pipe.search("apache spark reads", k=3).collect()
    assert hits
    top_chunk = pipe.chunks.read().filter(
        F.col("chunk_id") == hits[0].chunk_id
    ).collect()[0]
    assert "Spark" in top_chunk.chunk_text
