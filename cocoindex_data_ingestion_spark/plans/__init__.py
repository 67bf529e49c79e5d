"""Flow compilation + incremental execution (reference: src/builder/*,
src/execution/*)."""

from cocoindex_data_ingestion_spark.plans.flow import Flow, FlowScope
from cocoindex_data_ingestion_spark.plans.incremental import IncrementalRunner

__all__ = ["Flow", "FlowScope", "IncrementalRunner"]
