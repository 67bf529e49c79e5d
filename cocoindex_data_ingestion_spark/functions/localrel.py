"""Driver-side literal tables as TRUE LocalRelations.

``spark.createDataFrame(list, schema)`` parallelizes the list into a
Python RDD: every execution of the resulting plan re-runs a
32-task Python-worker job (measured 0.5-5 s per collect on
local[32]). Routing the rows through pandas+Arrow plants them in the
plan as a ``LocalRelation`` (~ms), which Catalyst can constant-fold,
broadcast for free, and re-execute without touching Python workers.

Every driver-side literal — query vectors, kmeans centroids between
iterations, BFS frontiers, index stats, test-case tables — should go
through :func:`local_df`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["local_df"]


def _field_names(schema: str) -> list[str]:
    fields, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            fields.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    fields.append("".join(cur))
    return [f.strip().split()[0] for f in fields]


def local_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """LocalRelation literal from (rows, DDL schema). Handles empty
    row lists (an empty LocalRelation keeps the schema)."""
    import pandas as pd

    names = _field_names(schema)
    pdf = pd.DataFrame(list(rows), columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)
