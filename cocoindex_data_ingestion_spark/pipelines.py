"""End-to-end document-ingestion pipeline.

Reference: the Celery chain ``parse → chunk → embed →
extract_entities → finalize`` (app/tasks/document_tasks.py:168-174)
with per-stage Supabase persistence, document state transitions, and
publish-on-approval to Qdrant + Neo4j (document_tasks.py:1587-1737).

Spark form: ONE driver program of five DataFrame stages. Stage
boundaries materialize to sinks (the review-then-publish pattern:
chunks land before approval; publish flips state and syncs the
vector + graph targets). Each stage is a pure function DataFrame →
DataFrame from the operator library, so Catalyst optimizes within a
stage and the sinks give replayability between stages.

The parse stage is the identity here (driver documents are already
text); a real deployment plugs an external-parser pandas UDF into
``parse_fn`` — same contract.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.localrel import local_df

from cocoindex_data_ingestion_spark import sinks
from cocoindex_data_ingestion_spark.operators import (
    chunking, embedding, entities, state_machine,
)


class IngestionPipeline:
    """parse → chunk → embed → extract → finalize over a documents
    DataFrame, with state tracking and publish-on-approval."""

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        gazetteer: dict[str, str],
        chunk_size: int = 300,
        embed_dim: int = 64,
        parse_fn: Callable[[DataFrame], DataFrame] | None = None,
    ):
        self.spark = spark
        self.gazetteer = gazetteer
        self.chunk_size = chunk_size
        self.embed_dim = embed_dim
        self.parse_fn = parse_fn or (lambda df: df)
        self.chunks = sinks.VectorSink(
            spark, f"{base_path}/chunks", ["chunk_id"],
            "chunk_id string, doc_id long, chunk_index int, location_start long, "
            "location_end long, chunk_text string, embedding array<float>",
            {"embedding": embed_dim},
        )
        self.graph = sinks.GraphSink(
            spark, f"{base_path}/graph",
            "node_id string, label string, name string, type string, _auto boolean",
            "src string, dst string, rel_type string",
        )
        self.docs_state = sinks.TableSink(
            spark, f"{base_path}/documents", ["doc_id"],
            "doc_id long, status string",
        )

    # -- stages -----------------------------------------------------------

    def process(self, docs: DataFrame) -> dict[str, int]:
        """Stages 1-4: parse, chunk, embed, extract; documents land in
        ``pending_review`` with chunks + entity mentions staged."""
        state = docs.select("doc_id").withColumn("status", F.lit("discovered"))
        state = state_machine.transition(state, "processing")

        parsed = self.parse_fn(docs)
        chunks = chunking.sentence_chunks(
            parsed, chunk_size=self.chunk_size
        )
        embedded = embedding.embed_documents(
            chunks,
            embedding.hash_embedder(dim=self.embed_dim),
            text_col="chunk_text",
        ).select(
            "chunk_id", "doc_id", "chunk_index", "location_start",
            "location_end", "chunk_text", "embedding",
        )
        self.chunks.merge(embedded)

        mentions = entities.quality_filter(
            entities.extract_mentions_gazetteer(
                self.chunks.read().withColumnRenamed("doc_id", "document_id"),
                self.gazetteer,
                id_col="chunk_id",
                doc_col="document_id",
                text_col="chunk_text",
            )
        )
        self._mentions = mentions.localCheckpoint(eager=True)

        state = state_machine.transition(state, "pending_review")
        state_machine.assert_no_invalid(state)
        self.docs_state.merge(state.select("doc_id", "status"))
        return {
            "documents": docs.count(),
            "chunks": self.chunks.read().count(),
            "mentions": self._mentions.count(),
        }

    def approve(self, doc_ids: list[int]) -> None:
        """Review gate: approve documents (pending_review → approved)."""
        cur = self.docs_state.read()
        moved = state_machine.transition(
            cur, "approved", condition=F.col("doc_id").isin(doc_ids)
        )
        state_machine.assert_no_invalid(moved)
        self.docs_state.sync(moved.select("doc_id", "status"))

    def publish(self) -> dict[str, int]:
        """Stage 5 (publish-on-approval): canonical entities + edges
        of APPROVED documents sync to the graph target; docs move to
        ``ingested`` (document_tasks.py:1587-1737)."""
        approved = self.docs_state.read().filter("status = 'approved'")
        mentions = self._mentions.join(
            approved.select(F.col("doc_id").cast("string").alias("document_id")),
            "document_id",
        )
        canon = entities.canonicalize(mentions)
        nodes = canon.select(
            F.col("entity_id").alias("node_id"),
            F.lit("Entity").alias("label"),
            "name",
            "type",
        )
        rels = entities.cooccurrence_relationships(mentions)
        edges = (
            rels.withColumn(
                "src", F.md5(F.concat_ws("\x00", "source_name", "source_type"))
            )
            .withColumn(
                "dst", F.md5(F.concat_ws("\x00", "target_name", "target_type"))
            )
            .select("src", "dst", F.col("relationship_type").alias("rel_type"))
        )
        self.graph.merge_nodes(nodes)
        self.graph.merge_edges(edges)

        moved = state_machine.transition(
            self.docs_state.read(),
            "ingested",
            condition=F.col("status") == "approved",
        )
        state_machine.assert_no_invalid(moved)
        self.docs_state.sync(moved.select("doc_id", "status"))
        return {
            "nodes": self.graph.nodes.read().count(),
            "edges": self.graph.edges.read().count(),
            "ingested": self.docs_state.read()
            .filter("status = 'ingested'")
            .count(),
        }

    # -- query surface over the published state ---------------------------

    def search(self, query_text: str, k: int = 5) -> DataFrame:
        """Vector search over the chunk collection using the SAME
        embedder at query time (transient-flow sharing, §3.2)."""
        from cocoindex_data_ingestion_spark.operators.vector_search import knn

        qdf = (
            local_df(self.spark, [(query_text,)], "text string")
            .coalesce(1)
            .select(
                embedding.hash_embedder(dim=self.embed_dim)(F.col("text")).alias(
                    "qvec"
                )
            )
        )
        return knn(
            self.chunks.read().crossJoin(F.broadcast(qdf)),
            F.col("qvec"),
            k=k,
            id_col="chunk_id",
        )
