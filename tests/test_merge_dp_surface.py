"""merge_dp_over_atoms: the DP-only surface of SplitRecursively
(split_recursively.rs:597-743) — equivalence with the full split()
path on real atomizer output, plus branch pins."""

from __future__ import annotations

from cocoindex_data_ingestion_spark.functions.split_recursively import (
    RecursiveChunker,
    _AtomCollector,
)
from cocoindex_data_ingestion_spark.operators.chunking import (
    merge_dp_over_atoms,
)

TEXT = (
    "Alpha beta gamma delta epsilon zeta.\n\n"
    "Eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau "
    "upsilon phi chi psi omega one two three four five six seven.\n"
    "Short tail line.\n\n"
    "Final paragraph with several more words to split across chunks "
    "and exercise the too-small penalty on the trailing piece."
)


def _real_atoms(text, cs, mn):
    ch = RecursiveChunker(text, cs, mn, 0)
    col = _AtomCollector(text)
    ch._collect(0, len(text), 0, col)
    atoms = col.finish()
    # merge_dp_over_atoms appends its own sentinel; feed the real
    # atoms WITHOUT it but pass the collector's final min_level so
    # the sentinel matches
    return atoms[:-1], atoms[-1].boundary_syntax_level


def test_dp_surface_matches_full_split(spark):
    cs, mn = 80, 30
    full = RecursiveChunker(TEXT, cs, mn, 0).split()
    atoms, sentinel_syntax = _real_atoms(TEXT, cs, mn)
    adf = spark.createDataFrame(
        [
            (1, i, a.start, a.end, a.boundary_syntax_level,
             a.internal_lb_level, a.boundary_lb_level)
            for i, a in enumerate(atoms)
        ],
        "doc_id long, idx long, start long, end long, "
        "boundary_syntax_level long, internal_lb_level long, "
        "boundary_lb_level long",
    )
    docs = spark.createDataFrame([(1, TEXT)], "doc_id long, text string")
    got = [
        (r["location_start"], r["location_end"], r["chunk_text"])
        for r in merge_dp_over_atoms(
            adf, docs, chunk_size=cs, min_chunk_size=mn,
            sentinel_syntax_level=sentinel_syntax,
        ).orderBy("chunk_index").collect()
    ]
    assert got == full
    assert len(got) >= 3


def test_oversize_atom_fallback(spark):
    # a single atom longer than chunk_size forces the break-fallback
    # plan (split_recursively.py:356-360)
    long_text = "x" * 150
    adf = spark.createDataFrame(
        [(1, 0, 0, 150, 0, 0, 0)],
        "doc_id long, idx long, start long, end long, "
        "boundary_syntax_level long, internal_lb_level long, "
        "boundary_lb_level long",
    )
    docs = spark.createDataFrame([(1, long_text)], "doc_id long, text string")
    got = merge_dp_over_atoms(
        adf, docs, chunk_size=100, min_chunk_size=40
    ).collect()
    assert len(got) == 1
    assert (got[0]["location_start"], got[0]["location_end"]) == (0, 150)


def test_merge_dp_is_batched_not_per_key(spark):
    """Regression guard for the r7 20x fix: the DP must run as ONE
    mapInPandas over packed per-document atom arrays — a cogrouped
    per-key applyInPandas re-enters Python once per document
    (~3.6 ms/doc of pure invocation overhead at sf0.1)."""
    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.operators.chunking import (
        merge_dp_over_atoms,
    )

    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    atoms = spark.createDataFrame(
        [(1, 0, 0, 2, 0, 0, 0)],
        "doc_id long, idx long, start long, end long, "
        "boundary_syntax_level int, internal_lb_level int, "
        "boundary_lb_level int",
    )
    out = merge_dp_over_atoms(atoms, docs, chunk_size=5, min_chunk_size=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapCoGroupsInPandas" not in plan
    assert plan.count("MapInPandas") == 1
