"""Hypothesis property tests over the pure-Python operator cores
(driven in one Spark round-trip per test for speed).

Models the reference's property style: chunk ranges must reproduce
their text (split_recursively.rs:1049-1071); duration parsing total
= sum of parts; packing respects bounds."""

import string

import pytest

from hypothesis import given, settings, strategies as st

from cocoindex_data_ingestion_spark.operators.chunking import _pack_sentences

TEXT_ALPHABET = string.ascii_lowercase + "  .,!?\n"


@given(
    sentences=st.lists(
        st.text(alphabet=string.ascii_lowercase + " ", min_size=1, max_size=80),
        min_size=1,
        max_size=30,
    ),
    chunk_size=st.integers(min_value=20, max_value=200),
)
@settings(max_examples=200, deadline=None)
def test_pack_sentences_bounds_and_order(sentences, chunk_size):
    offs = []
    pos = 0
    for s in sentences:
        offs.append((s, pos))
        pos += len(s) + 1
    full_text = " ".join(sentences)
    chunks = _pack_sentences(offs, chunk_size, full_text)
    assert chunks, "packing must always emit at least one chunk"
    idxs = [c[0] for c in chunks]
    assert idxs == list(range(len(chunks)))
    starts = [c[1] for c in chunks]
    assert starts == sorted(starts)
    longest = max(len(s) for s, _ in offs)
    for _, start, end, text in chunks:
        assert end - start == len(text)
        assert full_text[start:end] == text  # range contract
        # 1-sentence overlap means a flush can hold (overlap + next),
        # so the sound bound is chunk_size + longest sentence + sep —
        # the same property the reference's overlap packing has
        assert len(text) <= max(chunk_size, longest) + longest + 1


@given(
    parts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.sampled_from(["d", "h", "m", "s", "ms"]),
        ),
        min_size=0,
        max_size=5,
    )
)
@settings(max_examples=20, deadline=None)  # each example is a Spark job
@pytest.mark.slow  # ~2 min hypothesis matrix: explicit-only (r11, driver budget)
def test_duration_total_is_sum_of_parts(parts, spark):
    from cocoindex_data_ingestion_spark.functions.duration import (
        parse_duration_us,
    )

    mult = {"d": 86_400_000_000, "h": 3_600_000_000, "m": 60_000_000,
            "s": 1_000_000, "ms": 1_000}
    s = " ".join(f"{v}{u}" for v, u in parts)
    expected = sum(v * mult[u] for v, u in parts)
    df = spark.createDataFrame([(s,)], "s string").coalesce(1)
    got = df.select(parse_duration_us("s").alias("us")).collect()[0].us
    assert got == expected


def test_hash_embedder_series_properties():
    import math

    import pandas as pd

    from cocoindex_data_ingestion_spark.operators.embedding import (
        hash_embed_series,
    )

    texts = pd.Series(["alpha beta", "alpha  beta", "beta alpha", "", "x"])
    out = hash_embed_series(texts, dim=32).tolist()
    # whitespace-insensitive tokenization, order-sensitive sum
    assert out[0] == out[1]
    # unit norm for non-empty
    for v in (out[0], out[2], out[4]):
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    assert out[3] == [0.0] * 32
    # bag-of-words: reordering tokens preserves the vector (sum)
    assert [round(a, 12) for a in out[0]] == [round(b, 12) for b in out[2]]


@given(
    ops=st.lists(
        st.tuples(
            st.sampled_from(["upsert", "delete"]),
            st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                     max_size=6, unique=True),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=8, deadline=None)  # each op is a Spark write
@pytest.mark.slow  # ~1 min model-based matrix: explicit-only (r11, driver budget)
def test_bucketed_state_model_based(spark, tmp_path_factory, ops):
    """Model check: an arbitrary upsert/delete sequence against
    BucketedParquetState must equal the same sequence applied to a
    plain dict — state contents, not just no-crash."""
    from cocoindex_data_ingestion_spark.plans.incremental import (
        BucketedParquetState,
    )

    path = tmp_path_factory.mktemp("bstate_model")
    st_ = BucketedParquetState(
        spark, str(path), "k string, v long", key_col="k", n_buckets=4
    )
    model: dict[str, int] = {}
    version = 0
    for kind, keys in ops:
        version += 1
        if kind == "upsert":
            rows = [(f"k{i}", version * 100 + i) for i in keys]
            st_.merge(spark.createDataFrame(rows, "k string, v long"))
            for i in keys:
                model[f"k{i}"] = version * 100 + i
        else:
            st_.merge(
                spark.createDataFrame([], "k string, v long"),
                delete_keys=spark.createDataFrame(
                    [(f"k{i}",) for i in keys], "k string"
                ),
            )
            for i in keys:
                model.pop(f"k{i}", None)
    got = {r["k"]: r["v"] for r in st_.read().collect()}
    assert got == model
