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


# -- chunk_recursive_lang dispatch-oracle identity -----------------------------
#
# The DuckDB twin derives atoms from the two-level boundary identity
# encoded by each corpus row's (kw1, d1, kw2, d2, wd) constants. These
# tests pin that identity against the REAL atomizer (the oracle
# assumption), and that the shared-text trio actually discriminates
# languages (a dispatch bug cannot pass the oracle).

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.functions.split_recursively import (
    RecursiveChunker,
    _AtomCollector,
    resolve_separators,
)


def _l1_pieces(text, kw1):
    if kw1 is None:
        return [(0, text)]
    marker = "\n" + kw1
    idxs = []
    i = text.find(marker)
    while i >= 0:
        idxs.append(i)
        i = text.find(marker, i + 1)
    starts = [0] + [i + 1 for i in idxs]
    ends = idxs + [len(text)]
    return [(s, text[s:e]) for s, e in zip(starts, ends)]


def _l2_pieces(off, piece, kw2):
    if kw2 is None:
        return [(off, piece)]
    marker = "\n" + kw2 if kw2 else "\n"
    idxs = []
    i = piece.find(marker)
    while i >= 0:
        idxs.append(i)
        i = piece.find(marker, i + 1)
    starts = [0] + [i + 1 for i in idxs]
    ends = idxs + [len(piece)]
    return [(off + s, piece[s:e]) for s, e in zip(starts, ends)]


def _constructed_atoms(text, kw1, d1, kw2, d2, wd, mn):
    atoms = []
    first = True
    for p1off, p1 in _l1_pieces(text, kw1):
        if len(p1) <= mn:
            atoms.append(
                (p1off, p1off + len(p1), 0 if first else d1,
                 1 if "\n" in p1 else 0, 0 if p1off == 0 else 1)
            )
            first = False
            continue
        for i2, (p2off, p2) in enumerate(_l2_pieces(p1off, p1, kw2)):
            bd = d1 if (i2 == 0 and kw1 is not None) else d2
            if len(p2) <= mn:
                atoms.append(
                    (p2off, p2off + len(p2), 0 if first else bd, 0,
                     0 if p2off == 0 else 1)
                )
                first = False
            else:
                wpos = p2off
                for wi, w in enumerate(p2.split(" ")):
                    bs = 0 if first else (bd if wi == 0 else wd)
                    atoms.append(
                        (wpos, wpos + len(w), bs, 0,
                         1 if (wi == 0 and wpos > 0) else 0)
                    )
                    first = False
                    wpos += len(w) + 1
    n = len(text)
    atoms.append((n, n, 0, 0, 2))
    return atoms


def test_lang_corpus_atom_identity():
    mn, cs = entrymod._LANG_MN, entrymod._LANG_CS
    for did, lang, kw1, d1, kw2, d2, wd, text in entrymod._LANG_CORPUS:
        ch = RecursiveChunker(text, cs, mn, 0, resolve_separators(lang))
        col = _AtomCollector(text)
        ch._collect(0, len(text), 0, col)
        real = [
            (a.start, a.end, a.boundary_syntax_level,
             a.internal_lb_level, a.boundary_lb_level)
            for a in col.finish()
        ]
        want = _constructed_atoms(text, kw1, d1, kw2, d2, wd, mn)
        assert real == want, f"doc {did} ({lang}): atom identity broken"


def test_lang_corpus_discriminates_dispatch():
    mn, cs = entrymod._LANG_MN, entrymod._LANG_CS
    trio = [r for r in entrymod._LANG_CORPUS if r[0] in (1, 2, 3)]
    assert len({r[7] for r in trio}) == 1, "docs 1-3 must share one text"
    outs = {}
    for did, lang, *_rest, text in trio:
        ch = RecursiveChunker(text, cs, mn, 0, resolve_separators(lang))
        outs[lang] = tuple((s, e) for s, e, _t in ch.split())
    assert len(set(outs.values())) >= 2, (
        "shared-text trio no longer discriminates language dispatch: "
        f"{outs}"
    )


def test_lang_corpus_embedded_newline_atom():
    # doc 10 pins the L1-small-piece branch: an atom containing an
    # embedded newline with internal_lb_level 1
    row = next(r for r in entrymod._LANG_CORPUS if r[0] == 10)
    _did, lang, kw1, d1, kw2, d2, wd, text = row
    atoms = _constructed_atoms(text, kw1, d1, kw2, d2, wd, entrymod._LANG_MN)
    assert any(il == 1 for (_s, _e, _bs, il, _bl) in atoms)


# -- deterministic cross-engine HLL accuracy -----------------------------------


def test_det_hll_accuracy(spark, sf_dir):
    from cocoindex_data_ingestion_spark.operators import sketches

    li = load_table(spark, "lineitem", sf_dir)
    cells = sketches.det_hll_cells(
        li.select(F.col("l_returnflag").alias("g"), "l_partkey"),
        ["g"], "l_partkey",
    )
    est = {
        r["g"]: r["approx_parts"]
        for r in sketches.det_hll_estimate(
            cells, ["g"], out_col="approx_parts"
        ).collect()
    }
    exact = {
        r["g"]: r["d"]
        for r in li.groupBy(F.col("l_returnflag").alias("g"))
        .agg(F.countDistinct("l_partkey").alias("d"))
        .collect()
    }
    for g, d in exact.items():
        assert abs(est[g] - d) / d < 0.05, (g, est[g], d)


def test_det_hll_mergeability(spark, sf_dir):
    """MAX-merging finer cells must give the identical estimate as a
    single-pass sketch — the contract that makes the sketch table
    O(cells) at rollup time."""
    from cocoindex_data_ingestion_spark.operators import sketches

    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        F.col("event_type").alias("g"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    fine = sketches.det_hll_cells(base, ["g", "day"], "user_id")
    coarse = sketches.det_hll_cells(base, ["g"], "user_id")
    a = sorted(
        sketches.det_hll_estimate(fine, ["g"]).collect()
    )
    b = sorted(
        sketches.det_hll_estimate(coarse, ["g"]).collect()
    )
    assert a == b


def test_det_hll_negative_keys_cross_engine(spark):
    """The oracle's hash twin must track Spark's two's-complement
    hashLong for NEGATIVE keys too (unsigned_sql wrapping — latent
    until a signed column is hashed)."""
    import duckdb

    from cocoindex_data_ingestion_spark.operators import sketches

    vals = [-5, -4, -3, -2, -1, 1, 2, 3, 7, 1 << 40, -(1 << 40)]
    df = spark.createDataFrame(
        [("a", v) for v in vals] + [("b", -v) for v in vals],
        "g string, v long",
    )
    cells = sketches.det_hll_cells(df, ["g"], "v")
    got = {
        r["g"]: r["approx_distinct"]
        for r in sketches.det_hll_estimate(cells, ["g"]).collect()
    }

    import __spark_entry__ as em

    values = ", ".join(
        f"('a', {v})" for v in vals
    ) + ", " + ", ".join(f"('b', {-v})" for v in vals)
    ctes, est = em._det_hll_sql(
        f"SELECT g, v FROM (VALUES {values}) AS t(g, v)", "v", "neg"
    )
    from cocoindex_data_ingestion_spark.functions.compare import (
        stable_round_sql,
    )

    sql = f"WITH {ctes} SELECT g, {stable_round_sql('est', 4)} AS e FROM {est}"
    want = {g: e for g, e in duckdb.sql(sql).fetchall()}
    assert got == want
