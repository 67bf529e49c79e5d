"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` is a DataFrame program from the engine's
operator library (SURVEY.md §2 mapping cited per query); each entry
in ``oracle_sql()`` is the equivalent DuckDB SQL built from the SAME
shared constants (stopword list, regexes, BM25 params) so both sides
compute identical values. All float outputs are computed in double
precision and rounded to a fixed number of decimals on BOTH sides;
every ordering has a deterministic id tie-break.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.compare import (
    stable_round,
    stable_round_sql as _R,
)
from cocoindex_data_ingestion_spark.functions.similarity import cosine_sim_sql
from cocoindex_data_ingestion_spark.functions.text import (
    MIN_TOKEN_LEN,
    STOPWORDS,
    TOKEN_RE,
)
from cocoindex_data_ingestion_spark.operators import (
    bm25 as bm25_ops,
    chunking,
    dedup,
    fusion,
    graph as graph_ops,
    hybrid,
    relational,
    text_analysis,
    vector_search,
)
from cocoindex_data_ingestion_spark.sources.tables import load_table

# ---------------------------------------------------------------- shared consts

QUERY_TERMS = ["spark", "join", "window", "hash"]
KNN_K = 10
LEG_K = 20
BM25_K1, BM25_B = bm25_ops.K1, bm25_ops.B
RRF_K = fusion.RRF_K


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _qvec_df(emb: DataFrame) -> DataFrame:
    """The query vector: embedding of vec_id=0 (one-row broadcast)."""
    return emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qvec"))


# ------------------------------------------------------------- SQL fragments

_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
_TOKS_SQL = f"regexp_extract_all(lower(text), '{TOKEN_RE}')"
_BM25_TOKS_SQL = (
    f"list_filter({_TOKS_SQL}, t -> length(t) >= {MIN_TOKEN_LEN} "
    f"AND NOT list_contains({_STOPLIST_SQL}, t))"
)
_COS_SQL = cosine_sim_sql("e.embedding::DOUBLE[]", "q.qvec")
_QTERMS_SQL = "(" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + ")"

_VEC_KNN_SQL = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, {_R(_COS_SQL, 4)} AS score
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY score DESC, e.vec_id ASC
LIMIT {{k}}
"""

_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_BM25_TOKS_SQL}) AS token FROM documents
),
post AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
dls AS (SELECT doc_id, len({_BM25_TOKS_SQL}) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs FROM documents),
ad AS (SELECT avg(dl) AS avgdl FROM dls),
qpost AS (SELECT * FROM post WHERE token IN {_QTERMS_SQL}),
dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM qpost GROUP BY 1)
SELECT doc_id,
       {_R(f"sum(idf * tf * ({BM25_K1} + 1) / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)))", 4)}
         AS score
FROM (
  SELECT p.doc_id, p.tf, d.dl, s.n_docs, a.avgdl,
         ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0) AS idf
  FROM qpost p
  JOIN dfreq f USING (token)
  JOIN dls d USING (doc_id), stats s, ad a
)
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {{k}}
"""


def _hybrid_sql(limit: int = KNN_K) -> str:
    vec = _VEC_KNN_SQL.format(k=LEG_K)
    bm = _BM25_SQL.format(k=LEG_K)
    return f"""
WITH vec_leg AS ({vec}),
bm_leg AS ({bm}),
unioned AS (
  SELECT 'vector' AS source, vec_id AS id, score FROM vec_leg
  UNION ALL
  SELECT 'bm25' AS source, doc_id AS id, score FROM bm_leg
),
ranked AS (
  SELECT source, id,
         row_number() OVER (PARTITION BY source ORDER BY score DESC, id ASC) AS rank
  FROM unioned
)
SELECT id, {_R(f'sum(1.0 / ({RRF_K} + rank))', 4)} AS rrf_score,
       count(DISTINCT source) AS n_sources
FROM ranked
GROUP BY id
ORDER BY rrf_score DESC, id ASC
LIMIT {limit}
"""


def _weighted_fusion_sql(w: float = 0.7, limit: int = KNN_K) -> str:
    vec = _VEC_KNN_SQL.format(k=LEG_K)
    bm = _BM25_SQL.format(k=LEG_K)
    return f"""
WITH vec_leg AS ({vec}), bm_leg AS ({bm})
SELECT coalesce(v.vec_id, b.doc_id) AS id,
       {_R(f"{w} * coalesce(v.score, 0.0) + {1 - w} * coalesce(b.score, 0.0)", 4)}
         AS fused_score
FROM vec_leg v FULL OUTER JOIN bm_leg b ON v.vec_id = b.doc_id
ORDER BY fused_score DESC, id ASC
LIMIT {limit}
"""


def _sig_sql(col: str, n_bits: int) -> str:
    parts = " || ".join(
        f"(CASE WHEN {col}[{i + 1}] > 0 THEN '1' ELSE '0' END)" for i in range(n_bits)
    )
    return "(" + parts + ")"


# ---------------------------------------------------------------- the registry
# name -> (spark_fn, oracle_sql_or_None)

_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def _register(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


# -- §2.6 vector k-NN (search_service.py:56-117) ------------------------------


@_register("vector_knn", _VEC_KNN_SQL.format(k=KNN_K))
def _q_vector_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = _qvec_df(emb)
    return vector_search.knn(
        emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)),
        F.col("qvec"),
        k=KNN_K,
    )


# -- §2.6 LSH-bucketed ANN (scale path for vector search) ---------------------

_LSH_BITS = 8

_VEC_KNN_LSH_SQL = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qvec, {_sig_sql("embedding", _LSH_BITS)} AS qsig
  FROM embeddings WHERE vec_id = 0
)
SELECT e.vec_id, {_R(_COS_SQL, 4)} AS score
FROM embeddings e, q
WHERE e.vec_id <> 0 AND {_sig_sql("e.embedding", _LSH_BITS)} = q.qsig
ORDER BY score DESC, e.vec_id ASC
LIMIT {KNN_K}
"""


@_register("vector_knn_lsh", _VEC_KNN_LSH_SQL)
def _q_vector_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = _qvec_df(emb)
    return vector_search.knn_lsh(
        emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)),
        F.col("qvec"),
        k=KNN_K,
        n_bits=_LSH_BITS,
    )


# -- §2.6 BM25 (search_service.py:281-368) ------------------------------------


@_register("bm25_search", _BM25_SQL.format(k=KNN_K))
def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return bm25_ops.bm25_search(docs, QUERY_TERMS, k=KNN_K)


# -- §2.6 hybrid RRF (search_service.py:181-279, 370-423) ---------------------


@_register("hybrid_rrf", _hybrid_sql())
def _q_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    q = _qvec_df(emb)
    return hybrid.hybrid_search(
        docs,
        emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)),
        F.col("qvec"),
        QUERY_TERMS,
        k=KNN_K,
        leg_k=LEG_K,
    )


# -- §2.6 weighted score merge (search_service.py:502-542) --------------------


@_register("weighted_fusion", _weighted_fusion_sql())
def _q_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    q = _qvec_df(emb)
    vec_leg = vector_search.knn(
        emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q)),
        F.col("qvec"),
        k=LEG_K,
    ).withColumnRenamed("vec_id", "id")
    bm_leg = bm25_ops.bm25_search(docs, QUERY_TERMS, k=LEG_K).withColumnRenamed(
        "doc_id", "id"
    )
    return fusion.weighted_fuse(vec_leg, bm_leg, weight=0.7, limit=KNN_K)


# -- §2.8 aggregation pipeline (TPC-H Q1 shape) -------------------------------

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_R("sum(l_quantity)", 2)} AS sum_qty,
       {_R("sum(l_extendedprice)", 2)} AS sum_base_price,
       {_R("sum(l_extendedprice * (1 - l_discount))", 2)} AS sum_disc_price,
       {_R("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 2)} AS sum_charge,
       {_R("avg(l_quantity)", 4)} AS avg_qty,
       {_R("avg(l_extendedprice)", 4)} AS avg_price,
       {_R("avg(l_discount)", 4)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@_register("q1_pricing_summary", _Q1_SQL)
def _q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            stable_round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# -- §2.5 ordinal-monotonic keyed upsert (row_indexer.rs:110-131) -------------

_UPSERT_SQL = """
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@_register("ordinal_upsert_latest", _UPSERT_SQL)
def _q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "event_type",
            "value",
        )
    )


# -- §2.8 window/top-k per group (rank maps, search_service.py:381-383) -------

_TOPCUST_SQL = """
SELECT n_name, c_name, c_acctbal, CAST(rn AS BIGINT) AS rank_in_nation
FROM (
  SELECT n.n_name, c.c_name, c.c_acctbal,
         row_number() OVER (
           PARTITION BY c.c_nationkey ORDER BY c.c_acctbal DESC, c.c_custkey ASC
         ) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
WHERE rn <= 3
"""


@_register("top_customer_per_nation", _TOPCUST_SQL)
def _q_topcust(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    top = relational.topk_per_group(
        joined, ["c_nationkey"], "c_acctbal", 3, tiebreak_col="c_custkey"
    )
    return top.select(
        "n_name", "c_name", "c_acctbal", F.col("rn").cast("long").alias("rank_in_nation")
    )


# -- dedup: exact fingerprint (training-data op; entity dedup shape) ----------

_DEDUP_EXACT_SQL = """
SELECT fp, count(*) AS n_docs, min(doc_id) AS canonical_id
FROM (SELECT doc_id, md5(text) AS fp FROM documents)
GROUP BY fp
"""


@_register("dedup_exact", _DEDUP_EXACT_SQL)
def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


# -- text analysis profile (training-data op) ---------------------------------

_LANGS = sorted(text_analysis.LANG_MARKERS)


def _lang_hits_sql(lang: str) -> str:
    markers = "[" + ", ".join(f"'{m}'" for m in text_analysis.LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({_TOKS_SQL}, t -> list_contains({markers}, t)))"


def _text_profile_sql() -> str:
    hits = {lang: _lang_hits_sql(lang) for lang in _LANGS}
    greatest = "greatest(" + ", ".join(f"h_{lang}" for lang in _LANGS) + ")"
    lang_case = "CASE WHEN " + greatest + " = 0 THEN 'und' "
    for lang in _LANGS:
        lang_case += f"WHEN h_{lang} = {greatest} THEN '{lang}' "
    lang_case += "END"
    return f"""
WITH base AS (
  SELECT doc_id, text, {_TOKS_SQL} AS toks, {_BM25_TOKS_SQL} AS ctoks,
         {", ".join(f"{hits[lang]} AS h_{lang}" for lang in _LANGS)}
  FROM documents
),
derived AS (
  SELECT doc_id, text, toks, ctoks,
         len(toks) AS n_toks,
         CASE WHEN len(toks) > 0
              THEN len(list_filter(toks, t -> list_contains({_STOPLIST_SQL}, t)))
                   / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS sr,
         {lang_case} AS lang_pred
  FROM base
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(n_toks AS BIGINT) AS n_tokens,
       CAST(len(ctoks) AS BIGINT) AS n_content_tokens,
       {_R('sr', 4)} AS stopword_ratio,
       {_R('''CASE WHEN n_toks > 0
                  THEN list_sum(list_transform(toks, t -> length(t)))
                       / CAST(n_toks AS DOUBLE)
                  ELSE 0.0 END''', 4)} AS avg_token_len,
       {_R('''0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
             + 0.3 * (CASE WHEN n_toks > 0
                           THEN len(list_distinct(toks)) / CAST(n_toks AS DOUBLE)
                           ELSE 0.0 END)
             + 0.3 * (1.0 - abs(sr - 0.4))''', 4)} AS quality_score,
       lang_pred,
       md5(array_to_string(list_sort(list_distinct(ctoks)), ' ')) AS fingerprint
FROM derived
"""


@_register("text_profile", _text_profile_sql())
def _q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    prof = text_analysis.text_profile(docs)
    return prof.select(
        "doc_id",
        F.col("n_chars").cast("long"),
        F.col("n_tokens").cast("long"),
        F.col("n_content_tokens").cast("long"),
        "stopword_ratio",
        "avg_token_len",
        "quality_score",
        "lang_pred",
        "fingerprint",
    )


# ------------------------------------------------------------- driver surface


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hybrid (vector + BM25 → RRF) search at sf0.001."""
    return _q_hybrid(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None
    }
