"""Round-8 operator tests: engine-exact power-iteration PCA.

The oracle (driver gate) proves Spark == DuckDB bit-for-bit; these
tests pin the model to REAL PCA semantics — the quantized fixed-round
power iteration must land on numpy eigh's leading eigenvectors of the
same corpus, and the deterministic spec details (truncating division,
quantization, deflation) must behave as documented.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import vector_search
from cocoindex_data_ingestion_spark.sources.tables import load_table


def _corpus(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir).filter(
        F.col("vec_id") != 0
    )
    X = np.stack(
        [r["embedding"] for r in emb.select("embedding").collect()]
    ).astype(np.float64)
    return emb, X


def test_tdiv_truncates_toward_zero():
    # mirrors DuckDB's `//` (verified: (-7)//2 = -3 there, -4 in Python)
    assert vector_search._tdiv(-7, 2) == -3
    assert vector_search._tdiv(7, 2) == 3
    assert vector_search._tdiv(7, -2) == -3
    assert vector_search._tdiv(-7, -2) == 3


def test_power_iteration_matches_eigh(spark, sf_dir):
    emb, X = _corpus(spark, sf_dir)
    n, m, comps = vector_search.pca_power_fit(emb, k=2)
    assert n == len(X)

    # numpy reference PCA on the SAME (unquantized) corpus
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    top = v[:, order[:2]].T  # (2, d)

    for c in range(2):
        u = np.asarray(comps[c], dtype=np.float64)
        u = u / np.linalg.norm(u)
        cos = abs(float(u @ top[c]))
        assert cos > 0.999, f"component {c}: cosine {cos} vs eigh"


def test_power_projection_matches_float_projection(spark, sf_dir):
    emb, X = _corpus(spark, sf_dir)
    n, m, comps = vector_search.pca_power_fit(emb, k=2)
    out = (
        vector_search.pca_power_project(emb, n, m, comps)
        .orderBy("vec_id")
        .collect()
    )
    assert len(out) == len(X)

    mu = np.asarray(m, dtype=np.float64) / (n * vector_search._PCA_POW_S1)
    ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").collect()
    ]
    Xs = np.stack(
        [
            r["embedding"]
            for r in emb.select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        ]
    ).astype(np.float64)
    for c, col in ((0, "pc1"), (1, "pc2")):
        u = np.asarray(comps[c], dtype=np.float64) / vector_search._PCA_POW_S2
        ref = (Xs - mu) @ u
        got = np.asarray([r[col] for r in out])
        assert [r["vec_id"] for r in out] == ids
        # quantization error bound: S1 rounding contributes <= d/(2*S1)
        assert np.max(np.abs(got - ref)) < 1e-3


def test_projection_deterministic_across_partitioning(spark, sf_dir):
    emb, _ = _corpus(spark, sf_dir)
    n, m, comps = vector_search.pca_power_fit(emb, k=2)
    a = (
        vector_search.pca_power_project(emb, n, m, comps)
        .orderBy("vec_id")
        .collect()
    )
    b = (
        vector_search.pca_power_project(
            emb.repartition(13), n, m, comps
        )
        .orderBy("vec_id")
        .collect()
    )
    assert a == b
    # the fit itself is partition-invariant too (exact integer sums)
    n2, m2, comps2 = vector_search.pca_power_fit(emb.repartition(7), k=2)
    assert (n2, m2, comps2) == (n, m, comps)
