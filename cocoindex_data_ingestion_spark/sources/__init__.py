"""Source connectors (reference: src/ops/sources/*, app/connectors/*)."""

from cocoindex_data_ingestion_spark.sources.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
