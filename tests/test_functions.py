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
