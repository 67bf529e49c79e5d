"""functions/xxhash_sql: Spark's XxHash64 reimplemented for DuckDB.

Three layers of pinning:
1. the Python twin vs SPARK's xxhash64 (ints, strings, chained
   longs — bit-for-bit);
2. the generated DuckDB SQL vs the Python twin (randomized tokens
   and long chains);
3. the corpus precondition the minhash oracle rests on (bm25 tokens
   are 3-8 single-byte ASCII chars at every SF present).
"""

import os
import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions import xxhash_sql as xs


def test_python_twin_matches_spark(spark):
    toks = ["abc", "hash", "spark", "joined", "windows", "alphabet"]
    rows = spark.createDataFrame([(t,) for t in toks], "t string").select(
        "t",
        F.xxhash64(F.col("t")).alias("h"),
        F.xxhash64(F.lit(5), F.col("t")).alias("h5"),
    ).collect()
    for r in rows:
        assert r["h"] == xs.to_signed(xs.hash_bytes(r["t"].encode(), 42))
        assert r["h5"] == xs.to_signed(
            xs.hash_bytes(r["t"].encode(), xs.hash_int(5))
        )
    one = spark.createDataFrame(
        [(123456789123, -987654321)], "a long, b long"
    ).select(F.xxhash64(F.lit(2), F.col("a"), F.col("b")).alias("h")).first()
    assert one["h"] == xs.to_signed(
        xs.hash_long(
            -987654321 & xs.MASK,
            xs.hash_long(123456789123, xs.hash_int(2)),
        )
    )


def test_sql_token_hash_matches_twin():
    rng = random.Random(7)
    toks = sorted({
        "".join(rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(3, 8)))
        for _ in range(60)
    })
    seeds = [xs.hash_int(i) for i in range(4)]
    steps = list(xs.shared_token_steps("t"))
    steps += xs.interleave(
        [xs.token_hash_steps(f"m{i}", s) for i, s in enumerate(seeds)]
    )
    ctes, last, sel = xs.layered_cte_sql(
        f"SELECT unnest({toks!r}) AS t", "tk", steps, [],
        "SELECT t, "
        + ", ".join(f"{xs.signed_sql(f'm{i}_f')} AS h{i}" for i in range(4))
        + " FROM {last}",
        layer_size=8,
    )
    got = duckdb.sql(f"WITH {ctes}\n{sel}").df()
    for _, r in got.iterrows():
        for i, s in enumerate(seeds):
            assert int(r[f"h{i}"]) == xs.to_signed(
                xs.hash_bytes(r["t"].encode(), s)
            ), (r["t"], i)


def test_sql_long_chain_matches_twin():
    rng = random.Random(11)
    vals = [
        (rng.randint(-(2 ** 63), 2 ** 63 - 1),
         rng.randint(-(2 ** 63), 2 ** 63 - 1))
        for _ in range(20)
    ] + [(0, -1), (2 ** 63 - 1, -(2 ** 63))]
    steps = [("ua", xs.unsigned_sql("a")), ("ub", xs.unsigned_sql("b"))]
    steps += xs.hash_long_steps("l1", "ua", xs.hash_int(3))
    steps += xs.hash_long_steps("l2", "ub", "l1_f")
    ctes, last, sel = xs.layered_cte_sql(
        "SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in vals)
        + ") AS t(a, b)",
        "lv", steps, [],
        "SELECT a, b, " + xs.signed_sql("l2_f") + " AS h FROM {last}",
    )
    got = duckdb.sql(f"WITH {ctes}\n{sel}").df()
    for _, r in got.iterrows():
        exp = xs.to_signed(
            xs.hash_long(
                int(r["b"]) & xs.MASK,
                xs.hash_long(int(r["a"]) & xs.MASK, xs.hash_int(3)),
            )
        )
        assert int(r["h"]) == exp, (r["a"], r["b"])


def test_corpus_tokens_inside_sql_hash_domain(spark):
    """The minhash oracle hashes bm25 tokens: every one must be
    3-8 chars of single-byte ASCII at every SF present."""
    from cocoindex_data_ingestion_spark.functions.text import bm25_tokens
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    for sf in ("0.001", "0.01", "0.1"):
        d = f"/root/testdata/sf{sf}"
        if not os.path.isdir(d):
            continue
        docs = load_table(spark, "documents", d)
        bad = docs.select(
            F.explode(bm25_tokens("text")).alias("t")
        ).filter(
            (F.length("t") < 3) | (F.length("t") > 8)
            | (F.length("t") != F.octet_length("t"))
            | F.col("t").rlike("[^ -~]")
        ).limit(1).count()
        assert bad == 0, sf


def test_minhash_fast_star_edges_shape(spark, sf_dir):
    """The oracled subject itself: star edges (id_a = bucket min)
    never self-loop and id_a < id_b always (min is an endpoint)."""
    from cocoindex_data_ingestion_spark.operators import dedup
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    from cocoindex_data_ingestion_spark.functions.text import bm25_tokens

    edges = dedup.minhash_lsh_edges(
        docs.filter(F.size(bm25_tokens("text")) > 0),
        num_hashes=16, bands=4, hash_fn="xxhash64",
    )
    assert edges.filter("id_a >= id_b").count() == 0
