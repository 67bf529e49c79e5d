"""Quality filters (operators/quality.py) + winnowing dedup +
cluster-balanced sampling.

Oracle parity for all four queries is covered by
tools/check_correctness.py / the stability probe; these tests pin the
operator-level semantics on hand-built inputs where the right answer
is computable by eye.
"""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import curation, dedup, quality


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionProfile:
    def test_metrics_on_known_doc(self, spark):
        # "a b a b a b" : top bigram "a b" x3 of 5 bigrams, 6 tokens
        # -> top_bigram_frac = 2*3/6 = 1.0; trigrams: "a b a" x2,
        # "b a b" x2 -> 4 total 2 distinct -> dup = 0.5; max_run 1
        out = quality.repetition_profile(
            _docs(spark, [(1, "a b a b a b")])
        ).collect()[0]
        assert out.n_tokens == 6
        assert out.top_bigram_frac == 1.0
        assert out.dup_trigram_frac == 0.5
        assert out.max_run == 1
        assert not out.keep

    def test_max_run_counts_consecutive_only(self, spark):
        out = quality.repetition_profile(
            _docs(spark, [(1, "x x x y x zz ww qq rr ss tt uu vv")])
        ).collect()[0]
        assert out.max_run == 3

    def test_diverse_doc_kept(self, spark):
        text = " ".join(f"tok{i}" for i in range(40))
        out = quality.repetition_profile(_docs(spark, [(1, text)])).collect()[0]
        assert out.top_bigram_frac == pytest.approx(2 / 40)
        assert out.dup_trigram_frac == 0.0
        assert out.max_run == 1
        assert out.keep

    def test_single_token_doc_degenerates_to_zero_metrics(self, spark):
        out = quality.repetition_profile(_docs(spark, [(1, "hello")])).collect()[0]
        assert out.n_tokens == 1
        assert out.top_bigram_frac == 0.0
        assert out.dup_trigram_frac == 0.0
        assert out.max_run == 1


class TestUnigramLogprob:
    def test_uniform_corpus_uniform_nll(self, spark):
        import math

        # 4 tokens, each appearing once -> every doc avg_nll = ln(4)
        out = quality.unigram_logprob(
            _docs(spark, [(1, "aa bb"), (2, "cc dd")])
        ).collect()
        for r in out:
            assert r.avg_nll == pytest.approx(math.log(4), abs=1e-3)

    def test_rare_token_doc_scores_higher(self, spark):
        common = " ".join(["the"] * 20)
        out = {
            r.doc_id: r.avg_nll
            for r in quality.unigram_logprob(
                _docs(spark, [(1, common), (2, "rare words here")])
            ).collect()
        }
        assert out[2] > out[1]


class TestWinnowing:
    def test_shared_span_guarantee(self, spark):
        # Guarantee: a shared contiguous span of >= w+k-1 = 7 tokens
        # yields at least one common fingerprint.
        span = "alpha beta gamma delta epsilon zeta eta"
        d1 = "one two three " + span + " four five six"
        d2 = "seven eight nine ten " + span + " eleven"
        pairs = dedup.winnow_overlap_pairs(
            _docs(spark, [(1, d1), (2, d2)]), k=4, w=4
        ).collect()
        assert len(pairs) == 1
        assert pairs[0].n_shared >= 1
        assert 0 < pairs[0].overlap <= 1.0

    def test_disjoint_docs_share_nothing(self, spark):
        d1 = " ".join(f"a{i}" for i in range(20))
        d2 = " ".join(f"b{i}" for i in range(20))
        pairs = dedup.winnow_overlap_pairs(
            _docs(spark, [(1, d1), (2, d2)]), k=4, w=4
        ).collect()
        assert pairs == []

    def test_fingerprints_subset_of_gram_hashes(self, spark):
        # Winnowing selects minima of gram-hash windows: every
        # fingerprint is some gram's hash, and far fewer than all.
        text = " ".join(f"w{i % 13}" for i in range(60))
        docs = _docs(spark, [(1, text)])
        fps = dedup.winnow_fingerprints(docs, k=4, w=4)
        n_fps = fps.count()
        n_grams = 60 - 3
        assert 0 < n_fps < n_grams

    def test_df_cap_drops_boilerplate_fingerprint(self, spark):
        # The same text in 4 docs: with df_cap=3 every shared
        # fingerprint has df=4 > cap, so no pairs survive.
        text = " ".join(f"c{i}" for i in range(12))
        docs = _docs(spark, [(i, text) for i in range(1, 5)])
        assert (
            dedup.winnow_overlap_pairs(docs, k=4, w=4, df_cap=3).collect() == []
        )
        assert (
            dedup.winnow_overlap_pairs(docs, k=4, w=4, df_cap=10).count() == 6
        )  # all C(4,2) pairs


class TestExactSubstring:
    def test_shared_span_reported_in_both_docs(self, spark):
        span = " ".join(f"s{i}" for i in range(8))  # exactly L=8 tokens
        d1 = "one two three " + span + " four five"
        d2 = "alpha beta " + span + " gamma"
        out = {
            r.doc_id: r
            for r in dedup.exact_substring_spans(
                _docs(spark, [(1, d1), (2, d2)]), min_len=8
            ).collect()
        }
        assert set(out) == {1, 2}
        for r in out.values():
            assert r.n_spans == 1
            assert r.dup_tokens == 8
        assert out[1].n_tokens == 13
        assert out[1].dup_ratio == pytest.approx(8 / 13, abs=1e-4)

    def test_long_shared_run_merges_to_full_span(self, spark):
        # A shared run of 12 tokens is covered by 5 duplicated 8-grams
        # that must merge back into ONE span of exactly 12 tokens.
        run = " ".join(f"r{i}" for i in range(12))
        out = dedup.exact_substring_spans(
            _docs(spark, [(1, "x0 " + run), (2, run + " y0")]), min_len=8
        ).collect()
        assert all(r.n_spans == 1 and r.dup_tokens == 12 for r in out)

    def test_within_doc_repetition_counts(self, spark):
        run = " ".join(f"w{i}" for i in range(8))
        d1 = run + " mid1 mid2 " + run
        out = dedup.exact_substring_spans(
            _docs(spark, [(1, d1)]), min_len=8
        ).collect()
        assert len(out) == 1
        assert out[0].n_spans == 2
        assert out[0].dup_tokens == 16

    def test_unique_corpus_is_empty(self, spark):
        d1 = " ".join(f"a{i}" for i in range(20))
        d2 = " ".join(f"b{i}" for i in range(20))
        assert (
            dedup.exact_substring_spans(
                _docs(spark, [(1, d1), (2, d2)]), min_len=8
            ).collect()
            == []
        )

    def test_short_shared_span_below_l_ignored(self, spark):
        span = " ".join(f"t{i}" for i in range(7))  # 7 < L=8
        d1 = "p0 p1 " + span
        d2 = "q0 q1 " + span
        assert (
            dedup.exact_substring_spans(
                _docs(spark, [(1, d1), (2, d2)]), min_len=8
            ).collect()
            == []
        )


class TestClusterBalance:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        from cocoindex_data_ingestion_spark.sources.tables import load_table

        return load_table(spark, "embeddings", sf_dir).filter(
            F.col("vec_id") != 0
        )

    def test_cap_enforced_and_tail_intact(self, spark, emb):
        kept = curation.cluster_balance(emb, stride=11, cap=3)
        per_cell = kept.groupBy("cent_id").count().collect()
        assert all(r["count"] <= 3 for r in per_cell)
        # deterministic: same result on re-run
        again = curation.cluster_balance(emb, stride=11, cap=3)
        assert sorted(map(tuple, kept.collect())) == sorted(
            map(tuple, again.collect())
        )

    def test_cap_infinity_keeps_everything(self, spark, emb):
        n = emb.count()
        kept = curation.cluster_balance(emb, stride=11, cap=10**9)
        assert kept.count() == n

    def test_numpy_and_expr_assignment_agree(self, spark, emb):
        fast = curation.cluster_balance(emb, stride=11, cap=5, assign="numpy")
        slow = curation.cluster_balance(emb, stride=11, cap=5, assign="expr")
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )


class TestSemanticDedup:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_keep_first_drops_higher_id(self, spark):
        # ids 2 and 6 are identical vectors; centroid stride 2 makes
        # ids {2,4,6} centroids, everyone lands in some cell, and the
        # only >=0.99 pair is (2,6) -> 6 dropped with witness 2.
        rows = [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0]),
            (4, [0.0, 1.0, 0.0]),
            (5, [0.0, 0.9, 0.1]),
            (6, [0.9, 0.1, 0.0]),
        ]
        out = dedup.semantic_dedup_cells(
            self._emb(spark, rows), stride=2, threshold=0.999
        ).collect()
        assert len(out) == 1
        assert out[0].vec_id == 6 and out[0].witness == 2
        assert out[0].cos_sim == 1.0

    def test_below_threshold_drops_nothing(self, spark):
        # orthogonal vectors: no pair reaches the threshold
        out = dedup.semantic_dedup_cells(
            self._emb(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])]),
            stride=1,
            threshold=0.5,
        ).collect()
        assert out == []

    def test_numpy_and_expr_agree_on_testdata(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from cocoindex_data_ingestion_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir).filter(
            F.col("vec_id") != 0
        )
        fast = dedup.semantic_dedup_cells(
            emb, stride=11, threshold=0.3, assign="numpy"
        )
        slow = dedup.semantic_dedup_cells(
            emb, stride=11, threshold=0.3, assign="expr"
        )
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, slow.collect())
        )

    def test_blas_pair_path_matches_expression(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from cocoindex_data_ingestion_spark.sources.tables import load_table

        emb = load_table(spark, "embeddings", sf_dir).filter(
            F.col("vec_id") != 0
        )
        expr = dedup.semantic_dedup_cells(
            emb, stride=11, threshold=0.3, pair_compute="expr"
        )
        blas = dedup.semantic_dedup_cells(
            emb, stride=11, threshold=0.3, pair_compute="numpy"
        )
        assert sorted(map(tuple, expr.collect())) == sorted(
            map(tuple, blas.collect())
        )

    def test_temperature_mix_rebalances_toward_sqrt_share(self, spark):
        import math

        # 900 docs of lang A, 100 of lang B; budget 200.
        # w_A = sqrt(.9)=.949, w_B = sqrt(.1)=.316, Z=1.265
        # target_A = 200*.75 = 150, target_B = 200*.25 = 50
        rows = [(i, "aa") for i in range(900)] + [
            (i + 1000, "bb") for i in range(100)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        kept = curation.temperature_mix(docs, budget=200)
        by_lang = {
            r.lang: r.n
            for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        # hash sampling: expect target +- ~3 sigma (sqrt(target))
        assert abs(by_lang["aa"] - 150) < 4 * math.sqrt(150)
        assert abs(by_lang["bb"] - 50) < 4 * math.sqrt(50)
        # head share dropped from 90% toward 75%
        tot = by_lang["aa"] + by_lang["bb"]
        assert by_lang["aa"] / tot < 0.85
        # deterministic
        again = curation.temperature_mix(docs, budget=200)
        assert sorted(r.doc_id for r in kept.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_temperature_mix_keeps_tail_whole_when_budget_allows(self, spark):
        # tiny tail language under a generous budget: fraction
        # saturates at 1.0 and every tail doc survives
        rows = [(i, "aa") for i in range(500)] + [(900 + i, "bb") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        kept = curation.temperature_mix(docs, budget=400)
        n_bb = kept.filter(F.col("lang") == "bb").count()
        assert n_bb == 5

    def test_winnow_components_chain(self, spark):
        # doc 1 shares a long span with doc 2, doc 2 with doc 3 (a
        # different span) -> one component labeled 1, even though
        # docs 1 and 3 share nothing.
        s1 = "alpha beta gamma delta epsilon zeta eta theta"
        s2 = "iota kappa lambda mu nu xi omicron pi"
        docs = spark.createDataFrame(
            [
                (1, "one two three " + s1),
                (2, s1 + " filler words here " + s2),
                (3, s2 + " four five six"),
            ],
            "doc_id long, text string",
        )
        pairs = dedup.winnow_overlap_pairs(docs, k=4, w=4, min_shared=1)
        comp = {
            r.node_id: r.component
            for r in dedup.connected_components(
                pairs.select("id_a", "id_b")
            ).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1}
