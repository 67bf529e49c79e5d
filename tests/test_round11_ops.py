"""Round-11 optimization pins: shared-postings BM25 legs."""

import pytest
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import bm25 as bm25_ops

SF_DIR = "/root/testdata/sf0.001"

QUERY = ["data", "pipeline", "vector"]


@pytest.fixture(scope="module")
def docs(spark):
    from cocoindex_data_ingestion_spark.sources.tables import load_table

    return load_table(spark, "documents", SF_DIR)


def test_content_postings_matches_doc_lengths(spark, docs):
    """dl = sum(tf) over content postings must equal
    size(bm25_tokens(text)) per doc — the integer identity the shared
    table leans on."""
    via_post = {
        r["doc_id"]: r["dl"]
        for r in bm25_ops.content_postings(docs)
        .groupBy("doc_id").agg(F.sum("tf").alias("dl")).collect()
    }
    via_size = {
        r["doc_id"]: r["dl"]
        for r in bm25_ops.doc_lengths(docs).filter(F.col("dl") > 0).collect()
    }
    assert via_post == via_size


def test_prf_shared_postings_identical(spark, docs):
    """The postings-sharing PRF path (r11) must produce bit-identical
    expansion terms and final ranking to the per-leg tokenize path."""
    postings = bm25_ops.content_postings(docs).localCheckpoint(eager=True)
    dls_new = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    dls_old = bm25_ops.doc_lengths(docs).filter(F.col("dl") > 0)

    wt_old = bm25_ops.prf_expansion_terms(
        docs, QUERY, fb_docs=5, n_terms=3, beta=0.5, dls=dls_old
    )
    wt_new = bm25_ops.prf_expansion_terms(
        docs, QUERY, fb_docs=5, n_terms=3, beta=0.5,
        dls=dls_new, postings=postings,
    )
    assert sorted(map(tuple, wt_old.collect())) == sorted(
        map(tuple, wt_new.collect())
    )

    res_old = bm25_ops.bm25_search_weighted(docs, wt_old, k=10, dls=dls_old)
    res_new = bm25_ops.bm25_search_weighted(
        docs, wt_new, k=10, dls=dls_new, postings=postings
    )
    assert [tuple(r) for r in res_old.collect()] == [
        tuple(r) for r in res_new.collect()
    ]
