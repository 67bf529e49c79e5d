"""Taxonomy tag enrichment (metadata_extraction.py:17-114,
metadata_taxonomy.py:68-163): extraction regexes, spelling-variation
issue matching, combine/dedup/sort/cap semantics, categorize_tag
priority order."""

from __future__ import annotations

from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import taxonomy as tx


def _rows(spark, docs, llm=None):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    if llm is not None:
        lit = F.array(*[F.lit(t) for t in llm])
        df = df.withColumn("llm_tags", lit)
        out = tx.taxonomy_tags(df, text_col="text", llm_tags_col="llm_tags")
    else:
        out = tx.taxonomy_tags(df, text_col="text")
    return [r.asDict() for r in out.orderBy("doc_id", "tag_pos").collect()]


def test_model_extraction_and_classes(spark):
    got = _rows(spark, [(1, "the NC2050 and PC1000 units plus SM100")])
    tags = [(r["tag"], r["tag_class"], r["tag_category"]) for r in got]
    # all model-shaped → class 0, sorted by tag; NC2050/PC1000/SM100
    # are in PRODUCT_MODELS → category product
    assert tags == [
        ("NC2050", 0, "product"),
        ("PC1000", 0, "product"),
        ("SM100", 0, "product"),
    ]


def test_unknown_model_is_class0_but_custom(spark):
    # extraction regex \bNC\d{4}\b matches models outside the declared
    # vocabulary: they sort as products (tag_sort_key checks the
    # ^[A-Z]+\d+ shape) but categorize_tag's exact-membership check
    # buckets them custom (metadata_taxonomy.py:150-151)
    got = _rows(spark, [(1, "unknown NC9999 unit")])
    assert [(r["tag"], r["tag_class"], r["tag_category"]) for r in got] == [
        ("NC9999", 0, "custom")
    ]


def test_issue_spelling_variations(spark):
    # hyphenated, space-joined, and compressed spellings all map to
    # the canonical hyphenated issue tag (metadata_extraction.py:56-68)
    for text in (
        "we saw screen-flickering today",
        "we saw screen flickering today",
        "we saw screenflickering today",
    ):
        got = _rows(spark, [(1, text)])
        assert ("screen-flickering", 2, "issue") in [
            (r["tag"], r["tag_class"], r["tag_category"]) for r in got
        ], text


def test_component_word_boundary(spark):
    # 'ram' must not match inside 'program' (word boundaries,
    # metadata_extraction.py:44)
    got = _rows(spark, [(1, "the program crashed")])
    assert all(r["tag"] != "ram" for r in got)
    got = _rows(spark, [(1, "the ram module")])
    assert [(r["tag"], r["tag_category"]) for r in got] == [
        ("ram", "component")
    ]


def test_llm_tag_shadows_extracted_model(spark):
    # dedup is first-occurrence-wins in (llm, products, components,
    # issues) order, keyed by lowercased value: a lowercase LLM tag
    # 'nc2050' swallows the extracted 'NC2050', and the kept spelling
    # is the lowercase one (no ^[A-Z]+\d+ match) → class 3, custom
    # (metadata_extraction.py:89-101)
    got = _rows(spark, [(1, "ship NC2050 now")], llm=["nc2050"])
    assert [(r["tag"], r["tag_class"], r["tag_category"]) for r in got] == [
        ("nc2050", 3, "custom")
    ]


def test_llm_tags_normalized_and_sorted_last(spark):
    got = _rows(
        spark,
        [(1, "battery overheating in the NC2068")],
        llm=["  Troubleshooting  ", "Critical"],
    )
    assert [(r["tag"], r["tag_class"], r["tag_category"]) for r in got] == [
        ("NC2068", 0, "product"),
        ("battery", 1, "component"),
        ("overheating", 2, "issue"),
        # class-3 tail sorted alphabetically, lowercased+stripped
        ("critical", 3, "priority"),
        ("troubleshooting", 3, "action"),
    ]


def test_cap_15_after_sort(spark):
    # 38-component vocabulary text → far more than 15 candidates; the
    # cap applies AFTER the (class, tag) sort
    # (metadata_extraction.py:114)
    text = " ".join(t.replace("-", " ") + " " + t for t in tx.COMPONENTS)
    got = _rows(spark, [(1, text)])
    assert len(got) == 15
    assert [r["tag_pos"] for r in got] == list(range(1, 16))
    comps = [r["tag"] for r in got]
    assert comps == sorted(tx.COMPONENTS)[:15]
    assert all(r["tag_class"] == 1 for r in got)


def test_categorize_priority_order(spark):
    df = spark.createDataFrame(
        [
            ("NC2050",), ("display",), ("no-power",), ("repair",),
            ("RoHS",), ("rohs",), ("urgent",), ("zzz",), ("CE",),
        ],
        "tag string",
    )
    out = {
        r["tag"]: r["cat"]
        for r in df.select(
            "tag", tx.categorize_tag_col(F.col("tag")).alias("cat")
        ).collect()
    }
    assert out == {
        "NC2050": "product",
        "display": "component",
        "no-power": "issue",
        "repair": "action",
        "RoHS": "compliance",   # exact-case membership only
        "rohs": "custom",       # lowercased form misses the exact check
        "urgent": "priority",
        "zzz": "custom",
        "CE": "compliance",
    }


def test_no_llm_column_defaults_empty(spark):
    got = _rows(spark, [(1, "plain text with a battery")])
    assert [(r["tag"], r["tag_category"]) for r in got] == [
        ("battery", "component")
    ]
