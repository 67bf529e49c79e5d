"""Function-level tests: duration parsing, salted agg equivalence,
semantic chunker properties."""

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.duration import parse_duration_us
from cocoindex_data_ingestion_spark.operators import chunking, relational

US = 1_000_000


def test_parse_duration_formats(spark):
    cases = {
        "1h 30m": 5400 * US,
        "90s": 90 * US,
        "PT1H30M": 5400 * US,
        "2 days 4 hours": (2 * 86400 + 4 * 3600) * US,
        "1.5h": 5400 * US,
        "250ms": 250_000,
        "P1DT2H30M": (86400 + 2 * 3600 + 30 * 60) * US,
        "45 minutes": 45 * 60 * US,
        "1d 2h 3m 4s": (86400 + 7200 + 180 + 4) * US,
        "PT0.5S": 500_000,
        "": 0,
        "no units here": 0,
    }
    df = spark.createDataFrame(list(cases.items()), "s string, expected long")
    rows = df.withColumn("got", parse_duration_us("s")).collect()
    for r in rows:
        assert r.got == r.expected, f"{r.s!r}: {r.got} != {r.expected}"


def test_salted_agg_equals_plain_groupby(spark, sf_dir):
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    plain = {
        r.event_type: (r.n, r.mx)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r.event_type: (r.n, r.mx)
        for r in relational.salted_agg(
            ev, ["event_type"], {"n": ("count", "value"), "mx": ("max", "value")}
        ).collect()
    }
    assert plain == salted


def test_semantic_chunks_properties(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma. delta epsilon zeta. totally different topic now. "
             "more of that topic here. back to alpha beta gamma.")],
        "doc_id long, text string",
    )
    rows = chunking.semantic_chunks(docs, boundary_threshold=0.3).collect()
    assert rows
    text = docs.collect()[0].text
    for r in rows:
        # range consistency (same contract as every other chunker)
        assert text[r.location_start:r.location_end] == r.chunk_text
        assert r.n_sentences >= 1
    idx = [r.chunk_index for r in sorted(rows, key=lambda r: r.location_start)]
    assert idx == sorted(idx)


def test_with_retry_backoff_and_giveup():
    from cocoindex_data_ingestion_spark.functions.retry import with_retry

    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("transient")
        return "ok"

    assert with_retry(flaky, sleep=delays.append) == "ok"
    assert calls["n"] == 3 and len(delays) == 2

    def always_fails():
        raise IOError("down")

    import pytest as _pytest

    with _pytest.raises(IOError):
        with_retry(always_fails, max_retries=2, sleep=delays.append)


def test_batched_api_embedder_retries(spark):
    from cocoindex_data_ingestion_spark.operators.embedding import (
        batched_api_embedder, embed_documents,
    )

    state = {"fails_left": 1}

    def flaky_api(texts):
        if state["fails_left"] > 0:
            state["fails_left"] -= 1
            raise IOError("rate limited")
        return [[float(len(t)), 0.0] for t in texts]

    docs = spark.createDataFrame([(1, "ab"), (2, "abcd")], "doc_id long, text string").coalesce(1)
    out = embed_documents(docs, batched_api_embedder(flaky_api, batch_size=10))
    rows = {r.doc_id: r.embedding for r in out.collect()}
    assert rows[1][0] == 2.0 and rows[2][0] == 4.0


def test_bpe_pretokenizer_semantics(spark):
    """GPT-2-family pretokenizer: contractions split off, letter/digit
    runs keep their leading space, punctuation runs grouped, counts
    exclude pure-whitespace matches."""
    from cocoindex_data_ingestion_spark.operators.text_analysis import (
        bpe_pretokens, bpe_token_count,
    )

    df = spark.createDataFrame(
        [
            ("a", "I'll say it's 42 tokens!!"),
            ("b", "  leading  and   trailing  "),
            ("c", ""),
        ],
        "id string, text string",
    )
    from pyspark.sql import functions as F

    out = {
        r["id"]: (r["toks"], r["n"])
        for r in df.select(
            "id",
            bpe_pretokens("text").alias("toks"),
            bpe_token_count("text").alias("n"),
        ).collect()
    }
    toks_a, n_a = out["a"]
    assert toks_a == [
        "I", "'ll", " say", " it", "'s", " 42", " tokens", "!!",
    ]
    assert n_a == 8
    # whitespace runs never counted; multi-space gaps are their own
    # matches so words after them carry no space prefix
    toks_b, n_b = out["b"]
    assert [t for t in toks_b if t.strip()] == ["leading", "and", "trailing"]
    assert n_b == 3
    assert out["c"][1] == 0


def test_zorder_layout_bounds_both_dimensions(spark, tmp_path):
    """Z-order clustering: per-file min/max spread must be small in
    EVERY interleaved dimension (the property parquet min/max
    pruning exploits), unlike a single-column sort which leaves the
    other dimension's spread at full range."""
    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.functions.layout import (
        write_zordered, zorder_key,
    )

    n = 128
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("a"), (F.col("id") / n).cast("long").alias("b")
    )

    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(grid, zdir, ["a", "b"], bits=7, max_records_per_file=1024)
    (
        grid.repartitionByRange(16, "a").sortWithinPartitions("a")
        .write.option("maxRecordsPerFile", 1024).parquet(ldir)
    )

    def spreads(path):
        df = spark.read.parquet(path).withColumn("f", F.input_file_name())
        rows = df.groupBy("f").agg(
            (F.max("a") - F.min("a")).alias("sa"),
            (F.max("b") - F.min("b")).alias("sb"),
        ).collect()
        import statistics
        return (statistics.mean(r["sa"] for r in rows),
                statistics.mean(r["sb"] for r in rows))

    z_a, z_b = spreads(zdir)
    l_a, l_b = spreads(ldir)
    # z-order: BOTH dimensions bounded (~sqrt(file_rows) cells)
    assert z_a <= 48 and z_b <= 48, (z_a, z_b)
    # linear sort: the unsorted dimension spans (almost) full range
    assert l_b > 100, l_b
    # sanity: z-values themselves are monotone in the interleave
    vals = grid.select(zorder_key(["a", "b"], bits=7).alias("z")).agg(
        F.countDistinct("z")
    ).collect()[0][0]
    assert vals == n * n  # bijective on the grid


def test_salted_join_equals_plain_join(spark, sf_dir):
    """salted_join must produce the exact row multiset of the plain
    join (the salt only changes physical distribution)."""
    from cocoindex_data_ingestion_spark.operators.relational import salted_join
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = sorted(
        (r["l_orderkey"], r["l_quantity"], r["o_totalprice"])
        for r in li.join(o, "l_orderkey").collect()
    )
    salted = sorted(
        (r["l_orderkey"], r["l_quantity"], r["o_totalprice"])
        for r in salted_join(li, o, "l_orderkey", n_salts=8).collect()
    )
    assert salted == plain


def test_scd2_history_intervals(spark):
    from cocoindex_data_ingestion_spark.operators import relational

    # user 1: A A B A -> 3 versions; user 2: constant -> 1 version
    rows = [
        (1, 1, "2024-01-01 00:00:00", "A"),
        (2, 1, "2024-01-01 00:01:00", "A"),
        (3, 1, "2024-01-01 00:02:00", "B"),
        (4, 1, "2024-01-01 00:03:00", "A"),
        (5, 2, "2024-01-01 00:00:00", "X"),
        (6, 2, "2024-01-01 00:05:00", "X"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = relational.scd2_history(ev).collect()
    u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.version)
    assert [r.event_type for r in u1] == ["A", "B", "A"]
    assert [r.n_events for r in u1] == [2, 1, 1]
    # intervals chain: valid_to of v_i == valid_from of v_{i+1}
    for a, b in zip(u1, u1[1:]):
        assert a.valid_to_us == b.valid_from_us
    assert u1[-1].is_current and u1[-1].valid_to_us is None
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and u2[0].n_events == 2 and u2[0].is_current


def test_local_df_is_a_local_relation(spark):
    """Driver-side literals must plant LocalRelations (no Python-RDD
    re-execution per collect) and preserve schema, None cells, and
    nested array types through the pandas+Arrow path."""
    from cocoindex_data_ingestion_spark.functions.localrel import (
        _field_names, local_df,
    )

    assert _field_names(
        "a int, v array<struct<x:int,y:string>>, s string"
    ) == ["a", "v", "s"]

    df = local_df(
        spark,
        [(1, [0.5, 0.25], None), (2, [], "x")],
        "id long, vec array<float>, s string",
    )
    plan = df._jdf.queryExecution().optimizedPlan()
    assert "LocalRelation" in plan.getClass().getSimpleName()
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["s"] is None
    assert [round(v, 2) for v in rows[1]["vec"]] == [0.5, 0.25]
    assert rows[2]["vec"] == []
