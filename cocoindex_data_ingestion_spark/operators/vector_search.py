"""Vector similarity search over an embedding column.

Reference behavior: ``SearchService.vector_search`` — embed query →
cosine top-k with score threshold + metadata filters
(app/services/search_service.py:56-117); multi-vector fusion
(app/services/qdrant_service.py:306-388).

Spark-first design:

- **Brute-force exact top-k** is a single narrow pipeline:
  scan → (pushed-down metadata filters) → project score →
  ``TakeOrderedAndProject``. No shuffle of the full table — each
  partition computes its local top-k and only k rows per partition
  reach the driver-side merge. At 100 TB this is the correct exact
  baseline: embarrassingly parallel, bounded result traffic.
- **LSH-bucketed approximate top-k** (``knn_lsh``) is the scale
  path: a deterministic bit-sampling signature (sign of the first m
  components) buckets vectors; candidates = query's bucket only.
  The bucket equi-join broadcasts the 1-row query side, so the probe
  is a partition-pruned scan when the table is written partitioned
  by signature — turning top-k from O(N) into O(N / 2^m) per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.parallel import spread_python_stage

from cocoindex_data_ingestion_spark.functions.localrel import local_df

from cocoindex_data_ingestion_spark.functions.compare import stable_round
from cocoindex_data_ingestion_spark.functions.similarity import cosine_sim

# mmr_rerank collects an O(N²) pair matrix to the driver; 1000
# candidates = 1M pair rows ≈ tens of MB — the upper edge of sane
MMR_MAX_CANDIDATES = 1000


def with_score(
    df: DataFrame,
    query_vec: Column,
    vec_col: str = "embedding",
    score_col: str = "score",
) -> DataFrame:
    return df.withColumn(score_col, cosine_sim(F.col(vec_col), query_vec))


def knn(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    score_threshold: float | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k (reference default: limit=10, threshold=0.7).

    Deterministic order: score desc, id asc — ties can't reorder
    results between engines.
    """
    out = with_score(df, query_vec, vec_col)
    if score_threshold is not None:
        out = out.filter(F.col("score") >= F.lit(score_threshold))
    if round_to is not None:
        out = out.withColumn("score", stable_round(F.col("score"), round_to))
    return (
        out.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score")
    )


def lsh_signature(vec_col: Column | str, n_bits: int = 8) -> Column:
    """Deterministic bit-sampling LSH signature: sign of dims 0..n-1.

    A string of '0'/'1' so it doubles as a partition value. Cheap,
    engine-agnostic, and reproducible in SQL for the oracle.
    """
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat_ws(
        "",
        *[F.when(F.element_at(c, i + 1) > 0, "1").otherwise("0") for i in range(n_bits)],
    )


def lsh_hamming(
    vec_col: Column | str, qvec_col: Column, n_bits: int = 8
) -> Column:
    """Hamming distance between two vectors' sign signatures."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = [
        F.when(
            (F.element_at(c, i + 1) > 0) != (F.element_at(qvec_col, i + 1) > 0),
            1,
        ).otherwise(0)
        for i in range(n_bits)
    ]
    acc = bits[0]
    for b in bits[1:]:
        acc = acc + b
    return acc


def knn_lsh(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    n_bits: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 4,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's LSH bucket.

    At scale: write the table partitioned by ``lsh_sig`` and this
    filter becomes partition pruning — only 1/2^n_bits of the data is
    read.

    ``multiprobe`` > 0 also probes every bucket within that Hamming
    distance of the query's signature — the standard recall/scan-
    fraction dial: probing distance <=1 reads (1 + n_bits)/2^n_bits
    of the corpus instead of 1/2^n_bits. Here it is a per-row Hamming
    predicate (the SQL-oracle-able form); the indexed layout gets the
    same effect as STATIC partition pruning by enumerating the probe
    signatures into an IN list (indexing.indexed_knn(multiprobe=)).
    """
    if multiprobe > 0:
        out = df.filter(
            lsh_hamming(vec_col, query_vec, n_bits) <= F.lit(multiprobe)
        )
    else:
        sig = lsh_signature(vec_col, n_bits)
        qsig = lsh_signature(query_vec, n_bits)
        out = df.filter(sig == qsig)
    return knn(out, query_vec, k=k, vec_col=vec_col, id_col=id_col, round_to=round_to)


def knn_numpy(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Vectorized brute-force top-k: per-Arrow-batch numpy
    matrix·vector cosine.

    The expression-based :func:`knn` evaluates zip_with/aggregate in
    Spark's *interpreted* higher-order evaluator (~100 ns/element);
    this variant does one BLAS matvec per batch — the scale path for
    exact search (measured ~5-10× on 100k × 64-d). Scores can differ
    from the sequential-sum variant in the last float ulp (SIMD
    summation order), hence rows-only checking; ids agree except on
    exact ties at the rounding boundary."""
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum())) or 1.0

    schema = f"{id_col} long, score double"

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt((m * m).sum(axis=1))
            norms[norms == 0] = np.inf  # zero-norm rows score 0
            s = (m @ q) / (norms * qn)
            yield pd.DataFrame({id_col: pdf[id_col], "score": s})

    scored = spread_python_stage(
        df.select(id_col, vec_col), id_col
    ).mapInPandas(score, schema)
    p = float(10**round_to)
    return (
        scored.withColumn("score", F.floor(F.col("score") * p + 0.5) / p)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_maxsim_numpy(
    df: DataFrame,
    query_vecs: list[list[float]],
    k: int = 10,
    vecs_col: str = "embeddings",
    id_col: str = "id",
    round_to: int = 4,
) -> DataFrame:
    """Vectorized MaxSim top-k: one numpy ``Q @ Pᵀ`` per document.

    The expression-based :func:`knn_maxsim` runs nested lambdas in
    Spark's *interpreted* HOF evaluator — fine at toy shapes (16
    patches × 4 query tokens) but O(t·p·d) interpreted ops per doc
    dominates at real ColPali shapes (1030 patches × 128-d, ~4e6
    multiplies/doc). Here each Arrow batch does dense BLAS matmuls;
    crossover is roughly t·p·d ≳ 10⁴ per doc. Scores may differ in
    the last ulp (summation order) → rows-only checking; equivalence
    to the expression variant is tested at small shape."""
    import numpy as np
    import pandas as pd

    q = np.asarray(query_vecs, dtype=np.float64)  # t × d

    schema = f"{id_col} long, score double"

    def score(batches):
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.float64)
            for i, vecs in enumerate(pdf[vecs_col].to_numpy()):
                p = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
                out[i] = (q @ p.T).max(axis=1).sum()
            yield pd.DataFrame({id_col: pdf[id_col], "score": out})

    scored = spread_python_stage(
        df.select(id_col, vecs_col), id_col
    ).mapInPandas(score, schema)
    pw = float(10**round_to)
    return (
        scored.withColumn("score", F.floor(F.col("score") * pw + 0.5) / pw)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score")
    )


def knn_maxsim(
    df: DataFrame,
    query_vecs: Column,
    k: int = 10,
    vecs_col: str = "embeddings",
    id_col: str = "id",
) -> DataFrame:
    """Multi-vector (ColPali-style) MaxSim top-k (SURVEY §2.6)."""
    from cocoindex_data_ingestion_spark.functions.similarity import maxsim

    return (
        df.withColumn("score", stable_round(maxsim(query_vecs, F.col(vecs_col)), 4))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score")
    )


# --------------------------------------------------------------------- IVF ANN
#
# Coarse-quantizer approximate search (the classic IVF shape): assign
# every vector to its nearest centroid once, then answer queries by
# scanning only the ``nprobe`` centroid cells closest to the query.
# Complements ``knn_lsh``: LSH cells are fixed hyperplane cuts; IVF
# cells follow the data distribution.
#
# 100 TB design: centroid assignment is a one-time O(N·K) index build
# (write the corpus partitioned by ``cent_id``; the per-query cell
# filter then becomes static partition pruning exactly like the LSH
# index in operators/indexing.py), amortized over all queries. Query
# cost is O(N·nprobe/K). Centroid selection here is deterministic
# stride sampling so the oracle can reproduce it; at scale the
# centroids would be refined by a few k-means iterations (each one
# aggregate + broadcast — no extra machinery needed) without changing
# the query path.


def ivf_centroids(
    df: DataFrame,
    stride: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic coarse centroids: every ``stride``-th id.

    Ids are assigned in generation order (uncorrelated with vector
    direction), so stride sampling approximates uniform sampling of
    the corpus — the standard IVF "sample then refine" init with the
    refinement left out for cross-engine determinism."""
    return df.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Nearest-centroid assignment: argmax cosine, cent_id tie-break.

    Broadcast the (tiny) centroid table against the corpus, then pick
    each vector's argmax with ``max_by`` aggregation rather than a
    row_number window: the window would shuffle all N·K scored rows to
    sort each vector's candidates, while the aggregation gets map-side
    partial combine — each map task reduces its K candidates per vector
    locally, so only N best-so-far rows cross the wire. Same result
    (equivalence is covered by the nprobe>=K == exact-knn test); the
    plan you'd want at 100 TB.

    Tie-break: ``max_by`` on ``struct(csim, -cent_id)`` — lexicographic
    struct max prefers higher similarity, then lower cent_id, matching
    the oracle's ``ORDER BY csim DESC, cent_id ASC ... LIMIT 1``."""
    scored = df.crossJoin(F.broadcast(centroids)).withColumn(
        "_csim", cosine_sim(F.col(vec_col), F.col("cvec"))
    )
    carry = [c for c in df.columns if c != id_col]
    payload = F.struct(*[F.col(c) for c in carry], F.col("cent_id"))
    rank = F.struct(
        F.col("_csim").alias("s"), (-F.col("cent_id")).alias("t")
    )
    best = scored.groupBy(id_col).agg(F.max_by(payload, rank).alias("_best"))
    return best.select(
        F.col(id_col), *[F.col(f"_best.{c}") for c in carry + ["cent_id"]]
    )


def ivf_knn(
    df: DataFrame,
    qvec_df: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    stride: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    round_to: int | None = 4,
    assign: str = "numpy",
) -> DataFrame:
    """IVF approximate top-k: exact cosine within the ``nprobe``
    centroid cells nearest the query.

    ``assign``: ``"numpy"`` (default) does the O(N·K) nearest-centroid
    pass as an Arrow-batched BLAS argmax — the same code the index
    build uses (indexing._ivf_assign_numpy) and ~100× faster per pair
    than the interpreted higher-order-function cosine, which Spark
    cannot codegen; ``"expr"`` keeps the pure-expression path
    (bit-identical to the DuckDB oracle's arithmetic). The two agree
    unless a vector sits within ~1 ulp of equidistant between two
    centroids (equivalence-tested); FINAL scores are always computed
    with the exact expression cosine either way, so oracle parity
    rests only on cell membership.

    With ``nprobe`` >= the centroid count this degrades gracefully to
    exact :func:`knn` (equivalence-tested)."""
    cents = ivf_centroids(df, stride, vec_col, id_col)
    # Probe-cell selection is a top-nprobe over the (broadcast-sized by
    # construction) centroid table — collect the ids and filter with a
    # literal IN list, exactly like the indexed path's static partition
    # pruning (indexing.py), instead of a broadcast join: one fewer
    # exchange, and the same documented tiny-collect exception.
    probe_ids = [
        r.cent_id
        for r in (
            cents.crossJoin(F.broadcast(qvec_df))
            .withColumn("_csim", cosine_sim(F.col("cvec"), F.col(qvec_col)))
            .orderBy(F.col("_csim").desc(), F.col("cent_id").asc())
            .limit(nprobe)
            .select("cent_id")
            .collect()
        )
    ]
    if assign == "numpy":
        from cocoindex_data_ingestion_spark.operators.indexing import (
            _ivf_assign_numpy,
        )

        assigned = _ivf_assign_numpy(df, cents, vec_col, id_col)
    else:
        assigned = ivf_assign(df, cents, vec_col, id_col)
    cand = assigned.filter(F.col("cent_id").isin(probe_ids))
    return knn(
        cand.crossJoin(F.broadcast(qvec_df)),
        F.col(qvec_col),
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        round_to=round_to,
    )


# ---------------------------------------------------------------------- PQ ANN
#
# Product quantization (Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — the IVF-PQ design every
# billion-vector index uses): split each d-dim vector into m
# subvectors, quantize each against a tiny per-subspace codebook, and
# answer queries by (1) ranking all vectors with the asymmetric
# distance computation (ADC) over the m one-byte codes, then
# (2) exactly re-scoring only the top candidates.
#
# 100 TB framing: codes are m bytes/vector vs 4·d bytes of floats —
# a 64-d float corpus compresses 64:4 = 16×, so the ADC pass scans a
# table ~6% the size of the raw embeddings, and the exact rerank
# touches only `candidates` rows. The codebook (m·k codewords) is
# driver-tiny and broadcast/inlined; encoding is one scan of the
# corpus (production: Arrow-batched BLAS like indexing's IVF assign;
# here the expression path mirrors the DuckDB oracle bit-for-bit).
#
# Determinism: the codebook is the md5-ranked first-k sample of the
# corpus (uniform in id space, reproducible in SQL); argmin/ADC
# ranking uses stable_round-ed distances with code/vec-id tie-breaks
# so candidate membership can't flip on the last float ulp between
# engines.

PQ_SALT = "pq"


def _pq_rank(id_col: str) -> Column:
    return F.md5(F.concat(F.lit(PQ_SALT + "#"), F.col(id_col).cast("string")))


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two double arrays (sequential
    fold, same association order as the SQL twin's list_aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    df: DataFrame,
    m: int = 16,
    k: int = 16,
    sub_d: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-subspace codebooks: ``(subspace, code_id, cw)``.

    Codewords are the subvectors of the k md5-rank-first corpus
    vectors (uniform sample, engine-reproducible; at scale you'd
    Lloyd-refine them — a few broadcast+aggregate rounds — without
    changing the query path). k·m rows total: driver-tiny."""
    from pyspark.sql import Window

    rank = _pq_rank(id_col)
    sample = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(rank, F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(_pq_rank(id_col), F.col(id_col))
    coded = sample.withColumn("code_id", F.row_number().over(w) - 1)
    subspaces = F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("subspace")
    return coded.select(F.col("code_id"), subspaces, F.col("v")).select(
        "subspace",
        "code_id",
        F.slice(F.col("v"), F.col("subspace") * sub_d + 1, sub_d).alias("cw"),
    )


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 16,
    sub_d: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_round: int = 6,
) -> DataFrame:
    """Encode every vector as ``(id, subspace, code)``.

    One scan: explode m subvectors per row, broadcast-join the
    codebook, ``min_by`` argmin per (vector, subspace) — map-side
    partial aggregation, so the shuffle carries N·m best-so-far rows,
    not N·m·k candidates (same shape as ivf_assign). Production
    encode at 100 TB is the Arrow/BLAS single-pass variant; this
    expression path exists for oracle parity and small corpora."""
    subspaces = F.explode(F.array(*[F.lit(j) for j in range(m)])).alias("subspace")
    sub_vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).select(
        id_col,
        subspaces,
        F.col("v"),
    ).select(
        id_col,
        "subspace",
        F.slice(F.col("v"), F.col("subspace") * sub_d + 1, sub_d).alias("sv"),
    )
    scored = sub_vecs.join(F.broadcast(codebook), "subspace").withColumn(
        "_d", stable_round(l2_sq(F.col("sv"), F.col("cw")), dist_round)
    )
    pick = F.struct(F.col("_d").alias("d"), F.col("code_id").alias("c"))
    return scored.groupBy(id_col, "subspace").agg(
        F.min_by(F.col("code_id"), pick).alias("code")
    )


def pq_knn(
    df: DataFrame,
    qvec_df: DataFrame,
    k: int = 10,
    m: int = 16,
    cb_k: int = 16,
    sub_d: int = 4,
    candidates: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qvec_col: str = "qvec",
    round_to: int | None = 4,
    dist_round: int = 6,
    assign: str = "numpy",
) -> DataFrame:
    """PQ approximate top-k with exact rerank.

    ADC: the query's per-(subspace, code) distance table is m·k rows
    — computed once, broadcast; each encoded vector's approximate
    distance is the order-independent fixed-point sum of its m looked-
    up entries (stable_sum: partition layout can't flip candidate
    ranks). Top-``candidates`` by ADC feed an exact cosine rerank, so
    final scores are identical to brute-force :func:`knn` for every
    returned id.

    ``assign="numpy"`` (default) encodes with the Arrow/BLAS pass —
    same rationale as :func:`ivf_knn`; ``"expr"`` keeps the
    pure-expression encoder whose arithmetic the DuckDB oracle
    mirrors term for term. Both round distances to ``dist_round``
    fixed-point digits before any comparison, so they agree unless a
    subvector is ulp-equidistant between codewords at a rounding
    boundary (equivalence-tested)."""
    from cocoindex_data_ingestion_spark.functions.compare import stable_sum

    cb = pq_codebook(df, m, cb_k, sub_d, vec_col, id_col)
    if assign == "numpy":
        codes = pq_encode_numpy(df, cb, m, sub_d, vec_col, id_col, dist_round)
    else:
        codes = pq_encode(df, cb, m, sub_d, vec_col, id_col, dist_round)
    qsub = qvec_df.select(F.col(qvec_col).cast("array<double>").alias("qv"))
    qdist = (
        cb.crossJoin(F.broadcast(qsub))
        .select(
            "subspace",
            "code_id",
            F.slice(F.col("qv"), F.col("subspace") * sub_d + 1, sub_d).alias("qsv"),
            "cw",
        )
        .withColumn("qd", l2_sq(F.col("qsv"), F.col("cw")))
        .select("subspace", "code_id", "qd")
    )
    adist = (
        codes.join(
            F.broadcast(qdist),
            (codes["subspace"] == qdist["subspace"])
            & (codes["code"] == qdist["code_id"]),
        )
        .groupBy(id_col)
        .agg(stable_sum(F.col("qd"), dist_round).alias("ad"))
    )
    cand_ids = adist.orderBy(F.col("ad").asc(), F.col(id_col).asc()).limit(candidates)
    cand = df.join(F.broadcast(cand_ids.select(id_col)), id_col)
    return knn(
        cand.crossJoin(F.broadcast(qvec_df)),
        F.col(qvec_col),
        k=k,
        vec_col=vec_col,
        id_col=id_col,
        round_to=round_to,
    )


def pq_encode_numpy(
    df: DataFrame,
    codebook: DataFrame,
    m: int = 16,
    sub_d: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dist_round: int = 6,
) -> DataFrame:
    """Arrow-batched BLAS PQ encoder — the production twin of
    :func:`pq_encode` (same shape as indexing's IVF assign): one
    ``mapInPandas`` pass, codebook collected once (m·k·sub_d doubles,
    driver-tiny) and closed over, per-batch distance tensor
    ``(batch, m, k)`` in one vectorized op.

    Reproduces the expression path's ranking exactly-by-construction:
    distances go through the same ``floor(d·10^r + 0.5)/10^r``
    fixed-point rounding before the argmin (numpy's pairwise float
    summation can differ from the sequential fold in the last ulp;
    the rounding collapses that before any comparison), and
    ``argmin`` takes the lowest code on ties, matching the
    ``min_by(code_id, (d, code_id))`` tie-break. Equivalence is
    asserted in test_operators."""
    import numpy as np
    import pandas as pd

    rows = codebook.orderBy("subspace", "code_id").collect()
    k = max(r.code_id for r in rows) + 1
    cb = np.zeros((m, k, sub_d), dtype=np.float64)
    for r in rows:
        cb[r.subspace, r.code_id, :] = r.cw
    p = float(10**dist_round)

    def encode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ).reshape(len(pdf), m, sub_d)
            # (b, m, 1, d) - (m, k, d) -> (b, m, k)
            d = ((x[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=-1)
            d = np.floor(d * p + 0.5) / p
            codes = d.argmin(axis=-1)  # lowest index wins ties
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, m),
                    "subspace": np.tile(np.arange(m), len(pdf)),
                    "code": codes.reshape(-1),
                }
            )

    return spread_python_stage(
        df.select(id_col, vec_col), id_col
    ).mapInPandas(encode, schema=f"{id_col} long, subspace int, code int")


def mmr_rerank(
    emb: DataFrame,
    qvec_df: DataFrame,
    n_candidates: int = 20,
    k: int = 10,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Maximal Marginal Relevance diversification (Carbonell &
    Goldstein, SIGIR'98): greedily build a k-list maximizing
    ``lam·rel(q,d) − (1−lam)·max_{s∈S} sim(d,s)`` over a top-N
    candidate pool.

    Scale split: the two *data-sized* steps — exact top-N retrieval
    over the corpus and the N² candidate pair similarities — run as
    DataFrame programs (TakeOrderedAndProject scan; self-join over a
    broadcast N-row set). The greedy selection itself is O(k·N) over
    ≤ N² precomputed scalars, bounded by the query's own parameters
    (never by data size), so it runs driver-side on the collected
    candidate scores — the same bounded-collect exception as the
    1-row query vector. All decision inputs are stable-rounded so
    the selection is engine-reproducible (DuckDB oracle: unrolled
    greedy stages).

    Guard: the pair matrix is O(n_candidates²) rows collected to the
    driver — bounded and cheap at the intended k=10/N≈50 scale, but a
    caller passing N=10⁴ would ship 10⁸ rows. ``n_candidates`` above
    :data:`MMR_MAX_CANDIDATES` raises instead of silently flooding
    the driver. For genuinely larger pools, diversify hierarchically:
    cluster the pool first (``clustering.kmeans_fit`` /
    ``dedup.semantic_cells``) and run MMR per cluster or over cluster
    representatives — each greedy instance stays driver-bounded while
    the clustering pass stays distributed.
    """
    import math

    if n_candidates > MMR_MAX_CANDIDATES:
        raise ValueError(
            f"mmr_rerank n_candidates={n_candidates} exceeds "
            f"MMR_MAX_CANDIDATES={MMR_MAX_CANDIDATES}: the greedy stage "
            f"collects O(N²) pair similarities to the driver "
            f"({n_candidates**2:,} rows). Shrink the pool or diversify "
            "hierarchically (cluster, then MMR per cluster)."
        )

    rel_df = knn(
        emb.crossJoin(F.broadcast(qvec_df)),
        F.col("qvec"),
        k=n_candidates,
        vec_col=vec_col,
        id_col=id_col,
        round_to=round_to,
    )
    cand_ids = rel_df.select(id_col)
    cand_emb = emb.join(F.broadcast(cand_ids), id_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    a, b = cand_emb.alias("a"), cand_emb.alias("b")
    pair_df = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            stable_round(
                cosine_sim(F.col("a.v"), F.col("b.v")), round_to
            ).alias("sim"),
        )
    )
    rel = {r[id_col]: r["score"] for r in rel_df.collect()}
    sim: dict[tuple, float] = {}
    for r in pair_df.collect():
        sim[(r.id_a, r.id_b)] = r.sim
        sim[(r.id_b, r.id_a)] = r.sim

    selected = _greedy_mmr(rel, sim, k, lam, round_to)

    spark = emb.sparkSession
    return local_df(
        spark, selected, f"rank int, {id_col} long, mmr_score double"
    )


def _greedy_mmr(
    rel: dict, sim: dict, k: int, lam: float, round_to: int
) -> list[tuple[int, object, float]]:
    """The greedy MMR selection core over precomputed (rel, pairwise
    sim) scalars — O(k·N), driver/executor-agnostic pure Python.
    Strict > keeps the smallest id on ties (candidates visited in
    ascending id order); the returned mmr scores are stable-rounded
    so selections are engine-reproducible."""
    import math

    def _round(x: float) -> float:
        p = float(10**round_to)
        return math.floor(x * p + 0.5) / p

    selected: list[tuple[int, object, float]] = []
    remaining = set(rel)
    while remaining and len(selected) < k:
        best_id, best_val = None, None
        for c in sorted(remaining):
            if selected:
                mx = max(sim.get((c, s_id), 0.0) for _, s_id, _ in selected)
                val = lam * rel[c] - (1 - lam) * mx
            else:
                val = rel[c]
            if best_val is None or val > best_val:
                best_id, best_val = c, val
        selected.append((len(selected) + 1, best_id, _round(best_val)))
        remaining.discard(best_id)
    return selected


def mmr_rerank_hierarchical(
    emb: DataFrame,
    qvec_df: DataFrame,
    n_candidates: int = 5000,
    k: int = 10,
    lam: float = 0.7,
    cell_stride: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Hierarchical MMR for candidate pools past the flat guard
    (:data:`MMR_MAX_CANDIDATES`) — the documented large-pool path:

    1. exact top-N relevance pool (distributed TakeOrdered scan);
    2. cluster the pool into IVF cells (stride-sampled centroids +
       broadcast argmax assignment — both distributed, deterministic);
    3. LOCAL greedy MMR inside each cell via ``applyInPandas``: each
       group computes its own O(m²) pair similarities and keeps its
       top min(k, m) — the quadratic work is sharded across
       executors, and NOTHING O(N²) ever reaches the driver;
    4. exact flat MMR (expression-path pair cosines + the same greedy
       core) over the ≤ cells·k survivors.

    Exactness: when every cell holds ≤ k candidates (small pools, or
    ``cell_stride`` chosen so cells stay small), step 3 prunes
    nothing and the result is IDENTICAL to :func:`mmr_rerank` —
    pinned in tests. With real pruning the result is the standard
    cluster-MMR approximation; local pair cosines use numpy float64
    (SIMD summation can differ from the expression path in the last
    ulp, stable-rounded before any decision).
    """
    # Default stride scales with the pool so cells ~ sqrt(pool): a
    # FIXED stride makes the cell count linear in the pool and the
    # centroid assignment O(pool²·dim/stride) — measured 599 s at a
    # 100k pool with the old stride=50 default (SCALING.md r7 MMR
    # table). sqrt-balanced cells keep assignment AND the per-cell
    # greedy at O(pool^1.5).
    cell_stride = cell_stride or max(4 * k, int(n_candidates**0.5))
    rel_df = knn(
        emb.crossJoin(F.broadcast(qvec_df)),
        F.col("qvec"),
        k=n_candidates,
        vec_col=vec_col,
        id_col=id_col,
        round_to=round_to,
    )
    pool = emb.join(F.broadcast(rel_df.select(id_col, "score")), id_col).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.col("score").alias("rel"),
    )
    cents = ivf_centroids(pool, stride=cell_stride, vec_col="v", id_col="id")
    est_cells = max(1, n_candidates // cell_stride)
    if n_candidates * est_cells > 2_000_000:
        # big pool × many cells: the interpreted HOF cosine of
        # ivf_assign is the bottleneck — assign with one BLAS gram
        # argmax per Arrow batch instead (centroids are ≤ ~sqrt(pool)
        # rows, broadcast as a numpy matrix). Tie-break parity with
        # ivf_assign: centroid rows sorted by cent_id ascending, and
        # np.argmax returns the FIRST max — i.e. (csim, -cent_id)
        # lexicographic, same rule. Only the approximation path can
        # take this branch (small/oracled pools stay expression-exact).
        import numpy as np

        cent_rows = sorted(
            cents.collect(), key=lambda r: r["cent_id"]
        )
        cent_ids = np.array([r["cent_id"] for r in cent_rows])
        cmat = np.array(
            [np.asarray(r["cvec"], dtype=np.float64) for r in cent_rows]
        )
        cnorm = np.sqrt((cmat * cmat).sum(axis=1))
        cnorm[cnorm == 0] = 1.0
        cunit = cmat / cnorm[:, None]
        pool_v_type = dict(pool.dtypes)["v"]

        def assign_blas(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                vs = np.array(
                    [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
                )
                norms = np.sqrt((vs * vs).sum(axis=1))
                norms[norms == 0] = 1.0
                best = np.argmax((vs / norms[:, None]) @ cunit.T, axis=1)
                out = pdf[["id", "v", "rel"]].copy()
                out["cent_id"] = cent_ids[best]
                yield out

        assigned = spread_python_stage(pool, "id").mapInPandas(
            assign_blas,
            schema=f"id long, v {pool_v_type}, rel double, cent_id long",
        )
    else:
        assigned = ivf_assign(pool, cents, vec_col="v", id_col="id")
    if not cents.take(1):
        # degenerate pool (no id % stride == 0 member): one cell
        assigned = pool.withColumn("cent_id", F.lit(0))

    lam_, k_, rt_ = float(lam), int(k), int(round_to)

    def prune(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) <= k_:
            return pdf[["id", "v", "rel"]]
        vs = np.array([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        norms = np.sqrt((vs * vs).sum(axis=1))
        norms[norms == 0] = 1.0
        unit = vs / norms[:, None]
        gram = unit @ unit.T
        p = float(10**rt_)
        ids = list(pdf["id"])
        rel = dict(zip(ids, pdf["rel"]))
        idx = {d: i for i, d in enumerate(ids)}
        sim = {}
        for a_i, a in enumerate(ids):
            for b in ids[a_i + 1:]:
                s = float(np.floor(gram[idx[a], idx[b]] * p + 0.5) / p)
                sim[(a, b)] = s
                sim[(b, a)] = s
        keep = {t[1] for t in _greedy_mmr(rel, sim, k_, lam_, rt_)}
        return pdf[pdf["id"].isin(keep)][["id", "v", "rel"]]

    survivors = assigned.groupBy("cent_id").applyInPandas(
        prune, schema=f"id long, v {dict(pool.dtypes)['v']}, rel double"
    )
    # the survivor pool is ≤ cells·k; if a pathological stride choice
    # still exceeds the flat guard, keep the most relevant guard-many
    # (documented approximation, same bound the flat path enforces)
    survivors = survivors.orderBy(
        F.col("rel").desc(), F.col("id").asc()
    ).limit(MMR_MAX_CANDIDATES)
    survivors = survivors.localCheckpoint(eager=False)

    # final exact stage over the bounded survivor pool: expression-path
    # pair cosines (engine-exact), same greedy core
    surv_emb = survivors.select(F.col("id"), F.col("v"))
    a, b = surv_emb.alias("a"), surv_emb.alias("b")
    pair_df = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        stable_round(cosine_sim(F.col("a.v"), F.col("b.v")), round_to).alias(
            "sim"
        ),
    )
    rel = {r["id"]: r["rel"] for r in survivors.select("id", "rel").collect()}
    sim: dict[tuple, float] = {}
    for r in pair_df.collect():
        sim[(r.id_a, r.id_b)] = r.sim
        sim[(r.id_b, r.id_a)] = r.sim
    selected = _greedy_mmr(rel, sim, k, lam, round_to)
    spark = emb.sparkSession
    return local_df(
        spark, selected, f"rank int, {id_col} long, mmr_score double"
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-label centroid in LONG format ``(label, dim, centroid)`` —
    the elementwise mean every embedding-space pipeline stage needs
    (IVF/k-means training, cluster profiling, drift monitoring).

    Long format is the scale shape: posexplode → groupBy(label, dim)
    is one partial-agg-friendly shuffle of (labels × dims) cells; a
    wide array column would force whole-vector aggregation buffers.
    Fixed-point per-element summation keeps the mean bit-identical
    across partitionings and engines.
    """
    from cocoindex_data_ingestion_spark.functions.compare import stable_avg

    return (
        emb.select(
            F.col(label_col), F.posexplode(F.col(vec_col)).alias("dim0", "val")
        )
        .select(label_col, (F.col("dim0") + 1).alias("dim"), "val")
        .groupBy(label_col, "dim")
        .agg(stable_avg(F.col("val").cast("double"), round_to).alias("centroid"))
    )


def centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    k: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-space outlier report: each vector's cosine to its
    own label's centroid, lowest ``k`` first — the "atypical for its
    cluster" pruning signal (the distance-to-centroid complement of
    SemDeDup's too-close signal).

    Everything runs in the long format: the dot/norm sums are
    per-key fixed-point aggregations (order-independent), and the
    centroid table joins back as a broadcast (labels × dims rows).
    One explode + two groupBys; no vector ever crosses a shuffle as
    an array.
    """
    from cocoindex_data_ingestion_spark.functions.compare import (
        stable_round, stable_sum,
    )

    cents = label_centroids(emb, label_col, vec_col)
    longf = (
        emb.select(
            F.col(id_col),
            F.col(label_col),
            F.posexplode(F.col(vec_col)).alias("dim0", "val"),
        )
        .select(id_col, label_col, (F.col("dim0") + 1).alias("dim"),
                F.col("val").cast("double").alias("val"))
        .join(F.broadcast(cents), [label_col, "dim"])
    )
    per_vec = longf.groupBy(id_col, label_col).agg(
        stable_sum(F.col("val") * F.col("centroid"), 9).alias("dot"),
        stable_sum(F.col("val") * F.col("val"), 9).alias("se"),
        stable_sum(F.col("centroid") * F.col("centroid"), 9).alias("sc"),
    )
    cos = F.when(
        (F.col("se") > 0) & (F.col("sc") > 0),
        F.col("dot") / (F.sqrt(F.col("se")) * F.sqrt(F.col("sc"))),
    ).otherwise(F.lit(0.0))
    return (
        per_vec.select(
            id_col, label_col, stable_round(cos, round_to).alias("centroid_cos")
        )
        .orderBy(F.col("centroid_cos").asc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_signature_at(
    vec_col: Column | str, n_bits: int = 8, offset: int = 0
) -> Column:
    """Bit-sampling signature over dims [offset, offset+n_bits) —
    table ``t`` of a multi-table LSH family uses offset = t·n_bits,
    giving T independent signatures from disjoint coordinates."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(c, offset + i + 1) > 0, "1").otherwise("0")
            for i in range(n_bits)
        ],
    )


def knn_lsh_multitable(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int | None = 4,
) -> DataFrame:
    """Multi-table LSH: a vector is a candidate if it shares a bucket
    with the query in ANY of ``n_tables`` independent tables — the
    classic recall amplifier (miss probability (1−p)^T instead of
    1−p; scan fraction ≈ T/2^bits for isotropic data).

    Expressed as ONE scan with an OR-of-equalities predicate (each
    table = disjoint coordinate block), so no union/dedup pass is
    needed. The indexed form is T bucket-partitioned copies — the
    standard T× space-for-recall trade — each probed with static
    pruning exactly like the single-table layout.
    """
    cond = None
    for t in range(n_tables):
        eq = lsh_signature_at(vec_col, n_bits, t * n_bits) == lsh_signature_at(
            query_vec, n_bits, t * n_bits
        )
        cond = eq if cond is None else (cond | eq)
    return knn(
        df.filter(cond), query_vec, k=k, vec_col=vec_col, id_col=id_col,
        round_to=round_to,
    )


def pca_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    q: int = 8,
    whiten: bool = False,
    eps: float = 1e-9,
):
    """Fit a PCA (optionally whitening) model over an embedding
    column — the standard preprocessing for embedding compression,
    ANN quantization, and drift monitoring at corpus scale.

    Distributed pass: each Arrow batch reduces to (count, Σx, XᵀX)
    with BLAS inside ``mapInPandas``; the partials explode to
    (index, value) rows and ONE groupBy sums them — total driver-side
    state is d + d² numbers (bounded by the embedding dim, never the
    corpus), from which mean/covariance/eigenvectors come out of one
    ``numpy.linalg.eigh``. Eigenvector signs are fixed (largest-|·|
    coordinate positive) so the model is fully deterministic.

    Returns (mean: np.ndarray[d], components: np.ndarray[q, d],
    eigvals: np.ndarray[q]) with components scaled to whiten when
    requested.
    """
    import numpy as np
    import pandas as pd

    def _acc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    parts = emb.select(vec_col).mapInPandas(
        _acc, "n double, s array<double>, ss array<double>"
    )
    flat = parts.select(
        F.posexplode(F.concat(F.array(F.col("n")), "s", "ss")).alias("i", "v"),
    )
    sums = (
        flat.groupBy("i").agg(F.sum("v").alias("v")).orderBy("i").collect()
    )
    vals = np.array([r["v"] for r in sums])
    n = vals[0]
    # len(vals) = 1 + d + d²  →  d = (-1 + sqrt(1 + 4(len-1))) / 2
    d = int(round((-1 + (1 + 4 * (len(vals) - 1)) ** 0.5) / 2))
    mean = vals[1 : 1 + d] / n
    cov = vals[1 + d :].reshape(d, d) / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:q]
    eigvals, comps = w[order], v[:, order].T  # (q, d)
    # deterministic sign: largest-|coord| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    if whiten:
        comps = comps / np.sqrt(np.maximum(eigvals, eps))[:, None]
    return mean, comps, eigvals


def pca_project(
    emb: DataFrame,
    mean,
    components,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Project embeddings onto a fitted PCA basis: (x − mean) @ Wᵀ per
    row, BLAS-batched inside ``mapInPandas`` (the model is a few KB —
    closure-captured, effectively a broadcast). Zero shuffles.

    Returns (id, comps array<double>) rounded for cross-run
    stability."""
    import numpy as np
    import pandas as pd

    mu = np.asarray(mean, dtype=np.float64)
    W = np.asarray(components, dtype=np.float64)

    def _proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = np.round((X - mu) @ W.T, round_to)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "comps": list(map(list, P))}
            )

    out = spread_python_stage(
        emb.select(id_col, vec_col), id_col
    ).mapInPandas(_proj, f"id long, comps array<double>")
    return out.withColumnRenamed("id", id_col)


# -- engine-exact PCA via fixed-point power iteration --------------------------
#
# ``pca_fit`` is the production path (one distributed moment pass +
# driver-side eigh). It cannot be cross-engine ORACLED: eigh is not
# SQL-expressible and float covariance sums are accumulation-order-
# dependent. This variant trades the eigensolver for a FIXED-ROUND
# power iteration over an EXACT integer covariance, every step of
# which is deterministic integer/IEEE-scalar arithmetic — so a DuckDB
# recursive CTE replays it bit-for-bit (the xxhash64/BPE unroll
# precedent). Fidelity vs true PCA is pytest-pinned against numpy's
# eigh (cosine > 0.999 on the sf corpus).
#
# Engine-exact spec (mirrored in the entry's SQL twin):
#   q_j   = floor(x_j * S1 + 0.5)                    (int)
#   m_j   = Σ q_j ; G_ij = Σ q_i q_j ; C = n·G − m mᵀ (exact ints)
#   per component:
#     square the working matrix SQ times (power iteration converges
#     at (λ2/λ1)^t — the synthetic corpus is near-isotropic with
#     λ2/λ1 ≈ 0.99, so plain iteration stalls; 6 exact squarings
#     raise the effective ratio to (λ2/λ1)^64 per round), each
#     followed by the deterministic rescale
#       A ← tdiv(A·A, max|A·A| // CSCALE + 1)
#     then ROUNDS power rounds on the squared matrix:
#       w   = A · v                                   (exact int)
#       R   = max|w| // WSCALE + 1 ; wr = tdiv(w, R)  (trunc toward 0,
#                                                      DuckDB's `//`)
#       ns  = Σ wr² ; norm = sqrt(double(ns))
#       v'  = floor(wr_i · S2 / norm + 0.5)  (ns = 0 → keep v)
#     deflate the ORIGINAL C (shared eigvecs, true eigenvalue):
#       λq = tdiv(vᵀ C v, vᵀ v);  C ← C − tdiv(λq·v_i·v_j, S2²)
#   pc_k  = (n · (q·u_k) − m·u_k) / (S1 · S2 · n)    (int64 until the
#                                                     final division)
#
# Overflow headroom: distributed sums are int64 (per-term q² ≤ S1²·x²;
# exact up to ~10¹¹ rows at |x| ≤ 3); driver state is Python int
# (arbitrary precision), matching DuckDB's HUGEINT.

_PCA_POW_S1 = 10_000
_PCA_POW_S2 = 1_000_000
_PCA_POW_ROUNDS = 8
_PCA_POW_SQUARINGS = 6
_PCA_POW_WSCALE = 1_000_000_000
_PCA_POW_CSCALE = 10**12


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's ``//``."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def pca_power_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    rounds: int = _PCA_POW_ROUNDS,
    s1: int = _PCA_POW_S1,
    s2: int = _PCA_POW_S2,
):
    """Fit the engine-exact power-iteration PCA model.

    Distributed part: ONE scan reducing to (n, Σq, Σ qqᵀ) — int64
    partial sums inside ``mapInPandas`` (numpy integer matmul is
    exact), exploded to (index, value) and groupBy-summed JVM-side
    (d + d² + 1 accumulators, map-side combinable; driver state is
    dim-bounded, never corpus-bounded). Driver part: the fixed-round
    iteration above in pure Python ints.

    Returns (n, m: list[int], comps: list[list[int]]) — quantized at
    scale ``s2``."""
    import math

    import numpy as np
    import pandas as pd

    def _acc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.floor(X * s1 + 0.5).astype(np.int64)
            yield pd.DataFrame(
                {
                    "n": [len(Q)],
                    "s": [Q.sum(axis=0).tolist()],
                    "ss": [(Q.T @ Q).ravel().tolist()],
                }
            )

    parts = emb.select(vec_col).mapInPandas(
        _acc, "n long, s array<long>, ss array<long>"
    )
    flat = parts.select(
        F.posexplode(
            F.concat(F.array(F.col("n")), "s", "ss")
        ).alias("i", "v")
    )
    sums = flat.groupBy("i").agg(F.sum("v").alias("v")).orderBy("i").collect()
    vals = [int(r["v"]) for r in sums]
    n = vals[0]
    d = int(round((-1 + (1 + 4 * (len(vals) - 1)) ** 0.5) / 2))
    m = vals[1 : 1 + d]
    G = vals[1 + d :]
    C = [
        [n * G[i * d + j] - m[i] * m[j] for j in range(d)]
        for i in range(d)
    ]

    def _square(cm: list[list[int]]) -> list[list[int]]:
        cols = list(zip(*cm))
        sq = [
            [sum(a * b for a, b in zip(row, col)) for col in cols]
            for row in cm
        ]
        mx = max(abs(c) for row in sq for c in row)
        r = mx // _PCA_POW_CSCALE + 1
        return [[_tdiv(c, r) for c in row] for row in sq]

    def _iterate(cm: list[list[int]]) -> list[int]:
        for _ in range(_PCA_POW_SQUARINGS):
            cm = _square(cm)
        v = [s2] * d
        for _ in range(rounds):
            w = [sum(a * b for a, b in zip(row, v)) for row in cm]
            r = max(abs(x) for x in w) // _PCA_POW_WSCALE + 1
            wr = [_tdiv(x, r) for x in w]
            ns = sum(x * x for x in wr)
            if ns == 0:
                continue
            norm = math.sqrt(float(ns))
            v = [math.floor(float(x) * s2 / norm + 0.5) for x in wr]
        return v

    comps: list[list[int]] = []
    cm = C
    for _ in range(k):
        u = _iterate(cm)
        comps.append(u)
        num = sum(u[i] * cm[i][j] * u[j] for i in range(d) for j in range(d))
        den = sum(x * x for x in u)
        lam_q = _tdiv(num, den)
        cm = [
            [
                cm[i][j] - _tdiv(lam_q * u[i] * u[j], s2 * s2)
                for j in range(d)
            ]
            for i in range(d)
        ]
    return n, m, comps


def pca_power_project(
    emb: DataFrame,
    n: int,
    m: list,
    comps: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    s1: int = _PCA_POW_S1,
    s2: int = _PCA_POW_S2,
    round_to: int = 6,
) -> DataFrame:
    """Project onto the quantized power-iteration basis. Per-vector
    work is an int64 dot product per component (numpy, Arrow-batched,
    zero shuffles); everything stays integer-exact until the single
    final division, then ``stable_round`` — so the DuckDB twin agrees
    bit-for-bit."""
    import numpy as np
    import pandas as pd

    from ..functions.compare import stable_round

    U = np.asarray(comps, dtype=np.int64)  # (k, d)
    k = U.shape[0]
    pm = [sum(int(mi) * int(ui) for mi, ui in zip(m, U[c])) for c in range(k)]

    def _proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Q = np.floor(X * s1 + 0.5).astype(np.int64)
            P = Q @ U.T  # (rows, k) exact int64
            out = {"id": pdf[id_col].to_numpy()}
            for c in range(k):
                out[f"p{c + 1}"] = P[:, c]
            yield pd.DataFrame(out)

    schema = "id long, " + ", ".join(f"p{c + 1} long" for c in range(k))
    raw = spread_python_stage(
        emb.select(id_col, vec_col), id_col
    ).mapInPandas(_proj, schema)
    den = float(s1) * float(s2) * float(n)
    cols = [F.col("id").alias(id_col)]
    for c in range(k):
        # exact stage in decimal(38,0), NOT long: p ≈ d·s1·s2 ≈ 2e12,
        # so p·n wraps int64 around n ≈ 5e6 rows (and pm ∝ n overflows
        # a long literal) while the DuckDB twin's HUGEINT stays exact.
        # decimal keeps the Spark side exact to ~1e25 rows; pm rides
        # in as a string literal since Python ints above 2^63 can't
        # be F.lit'd directly.
        exact = F.col(f"p{c + 1}").cast("decimal(38,0)") * F.lit(n).cast(
            "decimal(38,0)"
        ) - F.lit(str(pm[c])).cast("decimal(38,0)")
        cols.append(
            stable_round(exact.cast("double") / F.lit(den), round_to).alias(
                f"pc{c + 1}"
            )
        )
    return raw.select(*cols)


def knn_batch(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
    qvec_col: str = "qvec",
    round_to: int = 4,
) -> DataFrame:
    """Batched exact k-NN: score a WHOLE query table against the
    corpus in ONE scan — the batch-serving / offline-eval shape
    (nq queries in one pass instead of nq corpus scans; on a real
    cluster this is the difference between an hour of repeated scans
    and one matrix-multiply-shaped job).

    ``queries`` is (query_id, qvec) — request-batch-sized, hence
    legitimately broadcast. Per-query top-k is TWO-PHASE, mirroring
    TakeOrderedAndProject: phase 1 keeps each INPUT partition's local
    top-k per query (window over (query, spark_partition_id) —
    bounded by partition size, fully parallel, no shuffle of the
    scored corpus); phase 2 ranks the surviving ≤ k·n_partitions
    rows per query. A single per-query window would instead drag the
    whole corpus through one sort task per query — the
    topk_per_group skew caveat at its worst when nq is small. The
    result is partitioning-invariant: every global top-k row is by
    definition in its partition's local top-k. A query's own id is
    excluded (self-match) when present in the corpus.

    Returns (query_id, rank, vec_id, score), rank 1..k per query.
    """
    from pyspark.sql import Window

    j = emb.crossJoin(F.broadcast(queries)).filter(
        F.col(id_col) != F.col(qid_col)
    )
    scored = j.select(
        qid_col,
        id_col,
        stable_round(
            cosine_sim(F.col(vec_col), F.col(qvec_col)), round_to
        ).alias("score"),
    )
    order = [F.desc("score"), F.asc(id_col)]
    w_local = Window.partitionBy(
        qid_col, F.spark_partition_id()
    ).orderBy(*order)
    pruned = (
        scored.withColumn("_lrn", F.row_number().over(w_local))
        .filter(F.col("_lrn") <= k)
        .drop("_lrn")
    )
    w_global = Window.partitionBy(qid_col).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= k)
        .select(qid_col, "rank", id_col, "score")
    )


# -- int8 symmetric quantization ----------------------------------------------

def with_int8_codes(
    df: DataFrame, vec_col: str = "embedding",
    codes_col: str = "codes", scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``codes = clamp(floor(x/scale + 0.5), -127, 127)`` — the 4x
    memory/bandwidth compression step of a production vector index
    (scan cost at 100 TB is dominated by bytes moved; int8 cuts the
    corpus-resident footprint to a quarter with ~1% cosine error at
    d=64, measured in tests). Codes are exact integers, so quantized
    dot products are engine-exact. Deterministic half-up rounding via
    the stable floor recipe; zero vectors quantize to all-zero codes
    with scale 1. At index-build scale this runs once per vector and
    amortizes (IncrementalVectorIndex discipline); the expression
    form here keeps the oracle twin exact."""
    v = F.col(vec_col)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    df = df.withColumn(
        scale_col,
        F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0)),
    )
    codes = F.transform(
        v,
        lambda x: F.least(
            F.lit(127.0),
            F.greatest(
                F.lit(-127.0),
                F.floor(x.cast("double") / F.col(scale_col) + F.lit(0.5)),
            ),
        ).cast("long"),
    )
    return df.withColumn(codes_col, codes)


def int8_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine over int8 code arrays — integer dot products (exact in
    double up to 2^53; 127^2 * d needs d < 5e8), zero-norm-safe."""
    from ..functions.similarity import dot

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    d = dot(a, b)
    na, nb = F.sqrt(dot(a, a)), F.sqrt(dot(b, b))
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def isotropy_profile(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Embedding-space isotropy in ONE PASS: the mean pairwise dot
    product over all n(n−1) ordered pairs collapses algebraically to
    ``(‖Σv‖² − Σ‖v‖²) / (n(n−1))`` — no pair join EVER, at any corpus
    size. High mean cosine (anisotropy / a dominant common direction)
    degrades cosine retrieval and clustering; this is the one-number
    health check embedding pipelines run per batch (Ethayarajh,
    EMNLP 2019 observed the effect in contextual encoders).

    Plan: one posexplode → per-DIM fixed-point sums (dim-bounded
    table) for Σv, one row-level aggregate for Σ‖v‖² and n; the
    final combination is arithmetic on a dim-bounded table. Also
    reports mean vector norm. All sums order-independent.
    """
    from pyspark.sql import functions as F

    from ..functions.compare import stable_round, stable_sum

    long = emb.select(
        F.col(id_col).alias("_i"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v"),
    )
    per_dim = long.groupBy("dim").agg(stable_sum(F.col("v"), 6).alias("s"))
    sum_sq_of_sums = per_dim.agg(
        stable_sum(F.col("s") * F.col("s"), 6).alias("_ss")
    )
    per_row = long.groupBy("_i").agg(
        stable_sum(F.col("v") * F.col("v"), 9).alias("_n2")
    )
    row_stats = per_row.agg(
        F.count("*").cast("double").alias("_n"),
        stable_sum(F.col("_n2"), 9).alias("_sn2"),
        stable_sum(F.sqrt(F.col("_n2")), 6).alias("_snorm"),
    )
    n = F.col("_n")
    mean_dot = (F.col("_ss") - F.col("_sn2")) / (n * (n - F.lit(1.0)))
    return (
        row_stats.crossJoin(F.broadcast(sum_sq_of_sums))
        .select(
            n.cast("long").alias("n_vectors"),
            stable_round(F.col("_snorm") / n, round_to).alias("mean_norm"),
            stable_round(mean_dot, round_to).alias("mean_pairwise_dot"),
        )
    )
