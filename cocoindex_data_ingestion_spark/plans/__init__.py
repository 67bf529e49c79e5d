"""Flow compilation + incremental execution (reference: src/builder/*,
src/execution/*)."""

from cocoindex_data_ingestion_spark.plans.flow import Flow, FlowScope
from cocoindex_data_ingestion_spark.plans.incremental import (
    BucketedParquetState, IncrementalRunner,
)
from cocoindex_data_ingestion_spark.plans.ivm import (
    MaterializedAgg,
    MaterializedDistinct,
)

__all__ = [
    "BucketedParquetState", "Flow", "FlowScope", "IncrementalRunner",
    "MaterializedAgg",
    "MaterializedDistinct",
]
