"""PySpark-native analytics/ingestion engine.

A from-scratch re-expression of the capabilities of the reference
repo ``ThomasZwart92/cocoindex-data-ingestion`` (a CocoIndex-based
document-ingestion + RAG-search system) on idiomatic PySpark:

- ``plans``      — declarative flow API (sources → transforms →
                   collectors → exports) compiled to DataFrame
                   programs, plus the incremental (ordinal /
                   content-hash / memoization) execution layer.
- ``sources``    — source connectors (local files, parquet tables,
                   stream sources).
- ``operators``  — the operator library: chunkers, BM25, vector
                   search, fusion, graph ops, dedup, text analysis,
                   entity pipeline, multimodal plumbing.
- ``functions``  — pure Column-expression helpers (similarity,
                   tokenization, hashing) shared by operators and by
                   the DuckDB oracle-SQL generators.
- ``streaming``  — Structured Streaming operators (watermarked
                   windows, ordinal-monotonic keyed upsert).

Everything is DataFrame-first: operators return/accept DataFrames and
compose lazily so Catalyst sees one logical plan per query.
"""

__version__ = "0.1.0"
