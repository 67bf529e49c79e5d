"""Unit tests for operators/curation.py (training-data curation).

Oracle parity for the registered curate_* queries is covered by
tools/check_correctness.py; these tests pin the operator-level
invariants: determinism under repartitioning, sampling-fraction
statistics, packing budget respect, contamination witness symmetry,
and canonical-pick tie-breaks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import curation, dedup
from cocoindex_data_ingestion_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, "documents", SF)


def test_fraction_threshold_bounds():
    assert curation.fraction_threshold(0.0) == "00000000"
    assert curation.fraction_threshold(0.5) == "80000000"
    # 1.0 must sort above every 8-digit hex string
    assert curation.fraction_threshold(1.0) > "ffffffff"
    with pytest.raises(ValueError):
        curation.fraction_threshold(1.5)


def test_hash_rank_partition_invariant(spark):
    """The kept set of a hash filter must not depend on layout."""
    docs = _docs(spark)
    thr = curation.fraction_threshold(0.3)
    kept1 = {
        r.doc_id
        for r in docs.filter(curation.hash_rank("doc_id") < thr)
        .select("doc_id")
        .collect()
    }
    kept2 = {
        r.doc_id
        for r in docs.repartition(13)
        .filter(curation.hash_rank("doc_id") < thr)
        .select("doc_id")
        .collect()
    }
    assert kept1 == kept2
    # ~30% of 50 docs; allow generous tolerance on the tiny sample
    assert 0.10 * docs.count() <= len(kept1) <= 0.55 * docs.count()


def test_stratified_sample_caps_and_determinism(spark):
    docs = _docs(spark)
    cap = 5
    s1 = curation.stratified_sample(docs, ["lang"], "doc_id", cap)
    per = {r.lang: r.n for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per.items():
        assert n == min(cap, base[lang])
    s2 = curation.stratified_sample(docs.repartition(7), ["lang"], "doc_id", cap)
    assert sorted(r.doc_id for r in s1.collect()) == sorted(
        r.doc_id for r in s2.collect()
    )


def test_weighted_mix_keep_all_and_none(spark):
    docs = _docs(spark)
    n = docs.count()
    all_kept = curation.weighted_mix(
        docs, "source", "doc_id", {}, default_weight=1.0
    ).count()
    assert all_kept == n
    none_kept = curation.weighted_mix(
        docs, "source", "doc_id", {}, default_weight=0.0
    ).count()
    assert none_kept == 0


def test_weighted_mix_is_monotone_in_weight(spark):
    """Hash sampling is nested: the 25% sample ⊆ the 50% sample."""
    docs = _docs(spark)

    def kept(w):
        return {
            r.doc_id
            for r in curation.weighted_mix(
                docs, "source", "doc_id", {}, default_weight=w
            )
            .select("doc_id")
            .collect()
        }

    k25, k50 = kept(0.25), kept(0.5)
    assert k25 <= k50


def test_pack_sequences_budget(spark):
    """A bin closes only when full: every bin except a partition's
    last must reach the budget including its closing doc; a new doc
    starts a new bin iff the running total already crossed."""
    docs = _docs(spark).select(
        "doc_id", "source", F.length("text").cast("long").alias("n_toks")
    )
    budget = 500
    packed = curation.pack_sequences(
        docs, "n_toks", "doc_id", budget, part_cols=["source"]
    )
    rows = packed.orderBy("source", "doc_id").collect()
    from collections import defaultdict

    cum = defaultdict(int)
    for r in rows:
        expect_bin = (cum[r.source]) // budget
        assert r.bin_id == expect_bin, (r, cum[r.source])
        cum[r.source] += r.n_toks


def test_word_ngrams_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta gamma delta epsilon")], ["id", "text"]
    )
    out = {
        r.id: r.g
        for r in df.select("id", curation.word_ngrams("text", 3).alias("g")).collect()
    }
    assert out[1] == []
    assert "alpha beta gamma" in out[2]
    assert len(out[2]) == 3


def test_decontaminate_witness(spark):
    """A doc sharing an n-gram with the benchmark is flagged; one
    with disjoint vocabulary is not."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (1, "he saw the quick brown fox jumps over a fence"),
            (2, "completely disjoint vocabulary here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    hits = {r.doc_id: r.n_hits for r in curation.decontaminate(
        train, bench, n=5).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits


def test_resolve_duplicates_canonical_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 300), (9, 50)], ["doc_id", "n_chars"]
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], ["node_id", "component"]
    )
    out = curation.resolve_duplicates(docs, comps).collect()
    assert len(out) == 1
    r = out[0]
    # max quality 300 shared by 2 and 3 -> lowest id wins
    assert (r.component, r.canonical_id, r.n_members, r.max_quality) == (1, 2, 3, 300)


def test_resolve_duplicates_on_real_components(spark):
    """End-to-end over the LSH dedup pipeline: every cluster yields
    exactly one canonical member that belongs to the cluster."""
    from cocoindex_data_ingestion_spark.functions.text import bm25_tokens

    docs = _docs(spark)
    nonempty = docs.filter(F.size(bm25_tokens("text")) > 0)
    edges = dedup.minhash_lsh_edges(nonempty, num_hashes=16, bands=4)
    comps = dedup.connected_components(edges)
    resolved = curation.resolve_duplicates(docs, comps, "doc_id", "n_chars")
    members = {
        r.component: r.ids
        for r in comps.groupBy("component")
        .agg(F.collect_set("node_id").alias("ids"))
        .collect()
    }
    for r in resolved.collect():
        assert r.canonical_id in members[r.component]
        assert r.n_members == len(members[r.component])


def test_decontaminate_window_path_matches_array_path(spark):
    """The codegen lead-window n-gram construction must produce the
    same (doc, distinct-gram) multiset as the array-lambda form."""
    docs = _docs(spark)
    n = 5
    array_side = (
        docs.select("doc_id", F.explode(curation.word_ngrams("text", n)).alias("g"))
        .select("doc_id", F.md5("g").alias("gram_h"))
        .collect()
    )
    from pyspark.sql import Window
    from cocoindex_data_ingestion_spark.functions.text import tokenize

    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select("doc_id", F.posexplode(tokenize("text")).alias("pos", "token"))
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    window_side = (
        toks.withColumn("gram", F.concat_ws(" ", *parts))
        .withColumn("_last", parts[-1])
        .filter(F.col("_last").isNotNull())
        .select("doc_id", F.md5("gram").alias("gram_h"))
        .distinct()
        .collect()
    )
    assert sorted((r.doc_id, r.gram_h) for r in array_side) == sorted(
        (r.doc_id, r.gram_h) for r in window_side
    )


def test_weighted_sample_prefers_heavy_rows(spark):
    """Sequential Poisson sampling: inclusion probability tracks the
    weight — a 100x-weight group must dominate the kept set, and the
    result is deterministic."""
    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.operators import curation

    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    kept = curation.weighted_sample(df, "w", "id", k=200)
    ids = [r["id"] for r in kept.collect()]
    heavy = sum(1 for i in ids if i % 2 == 0)
    assert heavy > 180  # ~99% expected from 100:1 odds across equal pools
    # deterministic: second run identical
    assert ids == [r["id"] for r in curation.weighted_sample(df, "w", "id", k=200).collect()]
    # zero/negative weights excluded
    df2 = spark.createDataFrame([(1, 0.0), (2, 5.0)], "id long, w double")
    assert [r["id"] for r in curation.weighted_sample(df2, "w", "id", 10).collect()] == [2]


def test_dsir_weights_semantics(spark):
    # target = docs containing a marker token: docs matching the
    # target distribution must score higher than docs that don't,
    # and the output must be repartition-invariant
    rows = [
        (1, "alpha alpha beta", "en"),
        (2, "alpha beta alpha", "en"),
        (3, "gamma delta gamma delta", "fr"),
        (4, "gamma delta epsilon", "fr"),
        (5, "alpha alpha alpha beta", "fr"),  # target-like but raw-labeled
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    w = {r.doc_id: r.dsir_weight for r in
         curation.dsir_weights(docs, F.col("lang") == "en", n_buckets=64).collect()}
    assert set(w) == {1, 2, 3, 4, 5}
    # target-vocabulary docs outscore off-target docs
    assert min(w[1], w[2], w[5]) > max(w[3], w[4])
    w2 = {r.doc_id: r.dsir_weight for r in
          curation.dsir_weights(docs.repartition(7), F.col("lang") == "en",
                                n_buckets=64).collect()}
    assert w == w2


def test_pii_redact_counts_and_replacement(spark):
    rows = [
        (1, "mail a@b.com and c.d+x@e.org, call +1-555-0100, ip 10.0.0.1"),
        (2, "no pii here"),
        (3, "edge 999.999.999.999 and 1-222-333"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curation.pii_redact(df).collect()}
    assert out[1].n_email == 2 and out[1].n_phone == 1 and out[1].n_ipv4 == 1
    assert "[EMAIL]" in out[1].text_redacted
    assert "@" not in out[1].text_redacted
    assert "555" not in out[1].text_redacted
    assert out[2].n_email == out[2].n_phone == out[2].n_ipv4 == 0
    assert out[2].text_redacted == "no pii here"
    # the ipv4 pattern is syntactic (no 0-255 range check) — documents
    # the conservative contract; phone needs the 3-3/4 shape
    assert out[3].n_ipv4 == 1 and out[3].n_phone == 1


def test_expectations_split_and_nulls(spark):
    from cocoindex_data_ingestion_spark.operators import expectations

    rows = [(1, 10.0), (2, -3.0), (3, None), (4, 55.0)]
    df = spark.createDataFrame(rows, "id long, qty double")
    rules = {
        "qty_pos": F.col("qty") > 0,
        "qty_cap": F.col("qty") <= 50,
    }
    good, bad = expectations.split(df, rules)
    assert {r.id for r in good.collect()} == {1}
    flags = {r.id: (r.ok_qty_pos, r.ok_qty_cap) for r in bad.collect()}
    # NULL counts as violation on BOTH rules (three-valued logic fenced)
    assert flags == {2: (False, True), 3: (False, False), 4: (True, False)}
    s = expectations.summarize(df, rules).collect()[0]
    assert (s.n_rows, s.bad_qty_pos, s.bad_qty_cap, s.n_valid) == (4, 2, 2, 1)


def test_boilerplate_strip_semantics(spark):
    """The RefinedWeb cleaning transform: a paragraph shared by >=
    min_docs distinct docs of the SAME source is stripped; unique
    paragraphs survive byte-identically in original order; a doc
    that is all boilerplate keeps its row with clean_text=''; the
    same paragraph under a different source is NOT stripped (scope
    is per-source); repeats within one doc count that doc once."""
    nav = "Home | About | Contact"
    rows = [
        # source A: nav appears in 3 distinct docs -> boilerplate
        (1, "A", f"{nav}\n\nalpha body one\n\nmore alpha"),
        (2, "A", f"{nav}\n\nbeta body two"),
        # doc 3 repeats nav twice: still ONE distinct doc, and both
        # copies are stripped leaving an all-boilerplate doc
        (3, "A", f"{nav}\n\n{nav}"),
        # source B has nav only once -> kept there
        (4, "B", f"{nav}\n\ngamma body"),
        (5, "B", "delta body"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    out = {
        r["id"]: r
        for r in curation.boilerplate_strip(docs, min_docs=3).collect()
    }
    assert out[1]["clean_text"] == "alpha body one\n\nmore alpha"
    assert (out[1]["n_paras"], out[1]["n_removed"]) == (3, 1)
    assert out[2]["clean_text"] == "beta body two"
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 2
    assert out[4]["clean_text"] == f"{nav}\n\ngamma body"  # scope!
    assert out[4]["n_removed"] == 0
    assert out[5]["clean_text"] == "delta body"
