"""Vector similarity as native Column expressions (JVM-side, codegen).

Reference behavior: cosine-similarity top-k search with score
threshold (app/services/search_service.py:56-117) and MaxSim late
interaction (src/ops/targets/qdrant.rs:11). Here similarity is a pure
expression over ``array<float>`` columns — no UDF, so it stays inside
whole-stage codegen and scales linearly with rows; the shuffle-free
plan is just scan → project → TakeOrderedAndProject.

Every function has a ``*_sql`` twin that emits the equivalent DuckDB
SQL so the driver's oracle compares like-for-like (both compute in
float64, left-to-right summation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity in double precision; null-safe on zero norms."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_sim_sql(a: str, b: str) -> str:
    """DuckDB SQL computing the same double-precision cosine.

    Uses explicit dot/norm (not list_cosine_similarity) so the
    accumulation order and precision match the Spark expression.
    """
    def _dot(x: str, y: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({x}, {y}), "
            f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        )

    d = _dot(a, b)
    na = f"sqrt({_dot(a, a)})"
    nb = f"sqrt({_dot(b, b)})"
    return f"(CASE WHEN {na} > 0 AND {nb} > 0 THEN ({d}) / ({na} * {nb}) ELSE 0.0 END)"


def maxsim(query_vecs: Column | str, doc_vecs: Column | str) -> Column:
    """ColBERT/ColPali MaxSim late interaction.

    sum over query token vectors of (max over doc patch vectors of
    dot(q, p)) — reference declares this comparator for multi-vector
    collections (qdrant MultiVectorComparator, SURVEY §2.6).
    Pure nested higher-order functions; no UDF.
    """
    q = F.col(query_vecs) if isinstance(query_vecs, str) else query_vecs
    d = F.col(doc_vecs) if isinstance(doc_vecs, str) else doc_vecs
    return F.aggregate(
        F.transform(
            q,
            lambda qv: F.array_max(
                F.transform(
                    d,
                    lambda dv: F.aggregate(
                        F.zip_with(
                            qv, dv, lambda x, y: x.cast("double") * y.cast("double")
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                )
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def euclidean_sim(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance inverted to a similarity, ``1 / (1 + d)``
    (EmbeddingService.calculate_similarity metric='euclidean',
    app/services/embedding_service.py:228-231). Double precision,
    pure expressions."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    sq = F.aggregate(
        F.zip_with(
            ca, cb,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.lit(1.0) / (F.lit(1.0) + F.sqrt(sq))


def euclidean_sim_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`euclidean_sim` (same accumulation
    shape)."""
    sq = (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        "(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
    )
    return f"(1.0 / (1.0 + sqrt({sq})))"
