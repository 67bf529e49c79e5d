"""Offline search-relevance evaluation: nDCG@k, MRR@k, precision@k,
recall@k over (ranking, qrels) tables.

The measurement half of the reference's search surface
(app/services/search_service.py exposes the rankings; a deployment
grades them offline against editorial or click-derived relevance
judgments). Everything is DataFrame-native and runs at any query-log
size: metrics are per-query aggregates joined on (query, doc), the
ideal-DCG ranking is a window PARTITIONED BY query (never global),
and every floating sum goes through ``stable_sum`` so results are
bit-identical across engines and partitionings — a DuckDB oracle can
grade the same tables.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.compare import (
    stable_round,
    stable_sum,
)


def ranking_metrics(
    ranking: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    round_to: int = 4,
) -> DataFrame:
    """Per-query IR metrics for a 1-based ranking against graded
    relevance judgments.

    - ``ndcg_at_k``  — DCG@k / ideal-DCG@k with the standard
      (2^rel − 1)/log2(rank+1) gain; 0.0 for queries with no
      relevant docs.
    - ``rr_at_k``    — reciprocal rank of the first relevant hit in
      the top k (mean over queries = MRR@k).
    - ``precision_at_k`` / ``recall_at_k`` — relevant-in-top-k over
      k / over total relevant.

    One join on (query, doc) + two per-query aggregations; the ideal
    ranking's row_number window is partitioned by query. Per-query
    DCG sums run through ``stable_sum`` (order-independent), so a
    re-partitioned rerun or a SQL oracle produces identical doubles.
    """
    q, d, r = F.col(query_col), F.col(id_col), F.col(rank_col)
    rel = F.col(rel_col)

    topk = ranking.filter(r <= k).select(query_col, id_col, rank_col)
    hits = (
        topk.join(qrels, [query_col, id_col], "left")
        .withColumn("_rel", F.coalesce(rel, F.lit(0)).cast("double"))
    )
    gain = (F.pow(F.lit(2.0), F.col("_rel")) - 1.0) / F.log2(r + 1)
    per_q = hits.groupBy(query_col).agg(
        stable_sum(gain, 6).alias("_dcg"),
        F.min(F.when(F.col("_rel") > 0, r)).alias("_first_rel_rank"),
        F.count(F.when(F.col("_rel") > 0, True)).alias("_n_rel_ret"),
    )

    relevant = qrels.filter(rel > 0)
    w_ideal = Window.partitionBy(query_col).orderBy(rel.desc(), d.asc())
    ideal = (
        relevant.withColumn("_irank", F.row_number().over(w_ideal))
        .filter(F.col("_irank") <= k)
        .groupBy(query_col)
        .agg(
            stable_sum(
                (F.pow(F.lit(2.0), rel.cast("double")) - 1.0)
                / F.log2(F.col("_irank") + 1),
                6,
            ).alias("_idcg")
        )
    )
    totals = relevant.groupBy(query_col).agg(
        F.count("*").alias("_n_rel_total")
    )

    out = (
        per_q.join(ideal, query_col, "left")
        .join(totals, query_col, "left")
        .select(
            q,
            stable_round(
                F.when(
                    F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg")
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("ndcg_at_k"),
            stable_round(
                F.coalesce(1.0 / F.col("_first_rel_rank"), F.lit(0.0)),
                round_to,
            ).alias("rr_at_k"),
            stable_round(
                F.col("_n_rel_ret") / F.lit(float(k)), round_to
            ).alias("precision_at_k"),
            stable_round(
                F.when(
                    F.col("_n_rel_total") > 0,
                    F.col("_n_rel_ret") / F.col("_n_rel_total").cast("double"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ).alias("recall_at_k"),
        )
    )
    return out


def embedding_drift_psi(
    emb_a: DataFrame,
    emb_b: DataFrame,
    vec_col: str = "embedding",
    lo: float = -1.0,
    hi: float = 1.0,
    n_buckets: int = 8,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between two embedding cohorts,
    per dimension — the drift monitor a production embedding pipeline
    runs between snapshots (model upgrades, corpus shifts, encoder
    regressions) before trusting an index refresh.

    PSI_d = Σ_buckets (p_a − p_b) · ln(p_a / p_b) over fixed-width
    value buckets on [lo, hi] (edge-clamped, ε-smoothed so empty
    buckets don't blow up the log). Deterministic by construction:
    fixed bucket edges (no data-dependent quantiles), integer counts,
    and the per-dim sum runs over a bounded bucket set.

    Shape: both cohorts posexplode into ONE tagged long stream, so a
    single map-side-combined groupBy (dim, bucket) produces both
    histograms in ONE corpus-sized shuffle; every later step (totals,
    dense grid, PSI terms) runs on the dim×bucket-bounded count
    table (≤ dims·buckets rows — legitimately broadcastable). The
    first version histogrammed each cohort separately and stitched
    them with joins + a window — 11 exchanges for the same counts;
    this shape plans 3, only one of them corpus-sized.

    Returns (dim, psi) sorted by dimension.
    """
    width = (hi - lo) / n_buckets

    def long_form(df: DataFrame, tag: int) -> DataFrame:
        v = F.col("v")
        bucket = F.least(
            F.greatest(
                F.floor((v.cast("double") - F.lit(lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        )
        return df.select(
            F.posexplode(F.col(vec_col)).alias("dim", "v")
        ).select("dim", bucket.alias("bucket"), F.lit(tag).alias("_c"))

    long = long_form(emb_a, 0).unionByName(long_form(emb_b, 1))
    counts = long.groupBy("dim", "bucket").agg(
        F.count(F.when(F.col("_c") == 0, True)).alias("c_a"),
        F.count(F.when(F.col("_c") == 1, True)).alias("c_b"),
    )
    return psi_from_counts(counts, n_buckets, eps, round_to)


def psi_from_counts(
    counts: DataFrame,
    n_buckets: int,
    eps: float = 1e-6,
    round_to: int = 6,
) -> DataFrame:
    """PSI per dim from a (dim, bucket, c_a, c_b) histogram-count
    table — the shared tail of the two-cohort and incremental drift
    paths. All inputs here are dim×bucket-bounded (never
    corpus-sized), so the broadcasts are legitimate."""
    tots = counts.groupBy("dim").agg(
        F.sum("c_a").alias("t_a"), F.sum("c_b").alias("t_b")
    )
    # dense (dim, bucket) frame so ε-smoothing covers EMPTY buckets on
    # either side — a bucket present in one cohort only must still
    # contribute its (p − ε)·ln(p/ε) term
    grid = tots.crossJoin(
        F.broadcast(
            counts.sparkSession.range(n_buckets).select(
                F.col("id").alias("bucket")
            )
        )
    )
    j = grid.join(F.broadcast(counts), ["dim", "bucket"], "left")
    p_a = F.coalesce(F.col("c_a"), F.lit(0)) / F.col("t_a") + F.lit(eps)
    p_b = F.coalesce(F.col("c_b"), F.lit(0)) / F.col("t_b") + F.lit(eps)
    term = (p_a - p_b) * F.log(p_a / p_b)
    return (
        j.groupBy("dim")
        .agg(stable_round(stable_sum(term, 9), round_to).alias("psi"))
        .orderBy("dim")
    )


class IncrementalDriftMonitor:
    """Drift monitoring against a MAINTAINED reference histogram: the
    per-(dim, bucket) counts live in a ``MaterializedAgg`` state
    (bucketed parquet, delta refresh — histograms are trivially
    mergeable), so each day's batch folds in with O(delta) work and
    any new batch can be PSI-scored against the accumulated
    reference WITHOUT rescanning history — the incremental twin of
    :func:`embedding_drift_psi`, same numbers (pinned in tests).

    refresh() inserts/deletes embedding rows; psi_vs(batch) scores a
    batch; the state is the only history-sized artifact and it is
    dim×bucket-bounded anyway.
    """

    def __init__(
        self,
        spark,
        path: str,
        vec_col: str = "embedding",
        lo: float = -1.0,
        hi: float = 1.0,
        n_buckets: int = 8,
    ):
        from cocoindex_data_ingestion_spark.plans.ivm import MaterializedAgg

        self.vec_col = vec_col
        self.lo, self.hi, self.n_buckets = lo, hi, n_buckets
        self.width = (hi - lo) / n_buckets
        # 4 state buckets, not the 32 default: the histogram state is
        # dim×bucket-bounded (≤ a few hundred rows) and every refresh
        # touches every cell, so bucket pruning has nothing to prune —
        # fewer buckets just means fewer files per generation
        # (measured 7.8→5.3 s for the 2-refresh+PSI cycle at sf0.1)
        self.view = MaterializedAgg(spark, path, group_col="db", n_buckets=4)

    def _long(self, emb: DataFrame) -> DataFrame:
        v = F.col("v")
        bucket = F.least(
            F.greatest(
                F.floor((v.cast("double") - F.lit(self.lo)) / F.lit(self.width)),
                F.lit(0),
            ),
            F.lit(self.n_buckets - 1),
        )
        return emb.select(
            F.posexplode(F.col(self.vec_col)).alias("dim", "v")
        ).select(
            F.concat_ws("#", F.col("dim"), bucket).alias("db")
        )

    def refresh(
        self, inserts: DataFrame | None = None, deletes: DataFrame | None = None
    ) -> None:
        self.view.refresh(
            inserts=self._long(inserts) if inserts is not None else None,
            deletes=self._long(deletes) if deletes is not None else None,
        )

    def reference_counts(self) -> DataFrame:
        return self.view.read().select(
            F.split("db", "#")[0].cast("int").alias("dim"),
            F.split("db", "#")[1].cast("long").alias("bucket"),
            F.col("n").alias("c_a"),
        )

    def psi_vs(
        self, batch: DataFrame, eps: float = 1e-6, round_to: int = 6
    ) -> DataFrame:
        bh = (
            self._long(batch)
            .select(
                F.split("db", "#")[0].cast("int").alias("dim"),
                F.split("db", "#")[1].cast("long").alias("bucket"),
            )
            .groupBy("dim", "bucket")
            .agg(F.count("*").alias("c_b"))
        )
        # union-aggregate, not a full-outer join: stitching two
        # dim×bucket-bounded tables with a join planned SMJ + 6
        # exchanges; one tagged union + groupBy plans 1 bounded
        # shuffle and needs no null-side coalesce
        counts = (
            self.reference_counts()
            .select("dim", "bucket", "c_a", F.lit(0).cast("long").alias("c_b"))
            .unionByName(
                bh.select(
                    "dim", "bucket",
                    F.lit(0).cast("long").alias("c_a"), "c_b",
                )
            )
            .groupBy("dim", "bucket")
            .agg(F.sum("c_a").alias("c_a"), F.sum("c_b").alias("c_b"))
        )
        return psi_from_counts(counts, self.n_buckets, eps, round_to)


def auc_binary(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label via the
    Mann-Whitney identity — ``AUC = P(score⁺ > score⁻) +
    ½·P(score⁺ = score⁻)`` — the one-number answer to "does this
    scorer separate the classes" for any model/heuristic a pipeline
    wants gated (quality filters, dedup scores, classifier logits).

    No global rank is materialized: the corpus reduces to
    per-DISTINCT-SCORE (n_pos, n_neg) counts in one shuffle; the
    running count of negatives below each score uses the
    partition-offset pattern (range repartition on score,
    per-partition running sums, partition totals broadcast as
    offsets — the ks_test_2samp shape, never a no-partition window);
    the AUC numerator is then one exact integer aggregate:
    ``Σ_s n_pos(s)·(2·cum_neg_below(s) + n_neg(s)) / (2·N⁺·N⁻)``.
    Integer headroom: numerator ≤ 2·n², inside int64 to ~10⁹ rows —
    past that, pre-bucket scores (AUC on quantized scores is the
    standard large-scale estimator).

    Returns one row: ``(n_pos, n_neg, auc, gini)``.
    """
    from pyspark.sql import Window

    from ..functions.compare import stable_round

    s = df.select(
        F.col(score_col).alias("_v"),
        F.when(F.col(label_col).cast("int") == 1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("_ip"),
    )
    per = (
        s.groupBy("_v")
        .agg(
            F.sum("_ip").alias("_np"),
            (F.count("*") - F.sum("_ip")).alias("_nn"),
        )
        .localCheckpoint(eager=False)
    )
    ordered = (
        per.repartitionByRange(F.col("_v"))
        .sortWithinPartitions("_v")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    ptot = ordered.groupBy("_pid").agg(F.sum("_nn").alias("_pn"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.select(
        "_pid", F.coalesce(F.sum("_pn").over(w_off), F.lit(0)).alias("_on")
    )
    w_local = Window.partitionBy("_pid").orderBy("_v")
    tot = per.agg(F.sum("_np").alias("_tp"), F.sum("_nn").alias("_tn"))
    terms = ordered.join(F.broadcast(offs), "_pid").select(
        (
            F.col("_np")
            * (
                F.lit(2)
                * (
                    F.sum("_nn").over(
                        w_local.rowsBetween(Window.unboundedPreceding, 0)
                    )
                    + F.col("_on")
                    - F.col("_nn")
                )
                + F.col("_nn")
            )
        ).alias("_t")
    )
    num = terms.agg(F.sum("_t").alias("_num"))
    auc = F.col("_num").cast("double") / (
        F.lit(2.0) * F.col("_tp").cast("double") * F.col("_tn").cast("double")
    )
    return (
        num.crossJoin(F.broadcast(tot))
        .select(
            F.col("_tp").cast("long").alias("n_pos"),
            F.col("_tn").cast("long").alias("n_neg"),
            stable_round(auc, round_to).alias("auc"),
            stable_round(F.lit(2.0) * auc - F.lit(1.0), round_to).alias("gini"),
        )
    )


# Poisson(1) CDF thresholds on the 32-bit hash scale: weight w for a
# (row, replica) is the count of thresholds <= hash — all-integer
# inverse-CDF sampling, so both engines draw the IDENTICAL weight.
# t_k = floor(P(Poisson(1) <= k) * 2^32), k = 0..7 (tail mass beyond
# 7 is ~1e-5 and maps to w=8).
POISSON1_T32 = (
    1580030168, 3160060337, 3950075421, 4213413783,
    4279248373, 4292415291, 4294609777, 4294923276,
)


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    b: int = 40,
    alpha: float = 0.025,
    salt: str = "boot",
    round_to: int = 4,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for a column mean — the
    LARGE-SCALE bootstrap (Chamandy et al., Google 2012: multinomial
    resampling needs global coordination; independent Poisson(1)
    weights per (row, replica) need none), which is how you attach
    error bars to any statistic at 100 TB in ONE pass.

    Fully deterministic and engine-exact: the per-(row, replica)
    weight is drawn by comparing a 32-bit md5 hash against the
    Poisson(1) CDF thresholds in INTEGER space (POISSON1_T32 — no
    float RNG anywhere); replica means are exact fixed-point
    ``Σ w·x / Σ w``; the interval takes the empirical
    ``⌈α·b⌉``-th / ``⌈(1−α)·b⌉``-th smallest replica means (type-1
    quantile, b-bounded window).

    Plan: the replica dimension explodes map-side (b literals) and
    folds straight into one groupBy(replica) — a single shuffle of
    b×rows weighted values, no per-replica scans.
    """
    from pyspark.sql import Window

    from ..functions.compare import stable_round, stable_sum

    lo_rn = max(1, math.ceil(alpha * b))
    hi_rn = min(b, math.ceil((1.0 - alpha) * b))

    # The b× explode plus per-(row, replica) md5 is the expensive part
    # and runs MAP-SIDE — on exactly as many tasks as the scan has
    # splits. A single small parquet file means one thread does all
    # b×n hashes (measured: the whole 5 s of the sf0.1 bench row).
    # Redistribute the narrow (value, id) base first: shuffling n
    # tiny rows buys full-cluster parallelism for the b×n fan-out and
    # evens out skewed/few input splits at any scale.
    rep = df.select(
        F.col(value_col).alias("_x"),
        F.col(id_col).cast("string").alias("_id"),
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, "_id").select(
        "_x",
        "_id",
        F.explode(F.array(*[F.lit(i) for i in range(b)])).alias("_b"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.lit(salt), F.col("_id"), F.col("_b").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = sum(
        F.when(h >= F.lit(t), F.lit(1)).otherwise(F.lit(0))
        for t in POISSON1_T32
    )
    means = (
        rep.withColumn("_w", w)
        .groupBy("_b")
        .agg(
            stable_sum(F.col("_w").cast("double") * F.col("_x"), 6).alias(
                "_swx"
            ),
            F.sum("_w").alias("_sw"),
        )
        .select(
            "_b",
            (F.col("_swx") / F.col("_sw").cast("double")).alias("_m"),
        )
    )
    w_rank = Window.orderBy(F.col("_m").asc(), F.col("_b").asc())
    ranked = means.withColumn("_rn", F.row_number().over(w_rank))
    lo = ranked.filter(F.col("_rn") == lo_rn).select(
        F.col("_m").alias("_lo")
    )
    hi = ranked.filter(F.col("_rn") == hi_rn).select(
        F.col("_m").alias("_hi")
    )
    base = df.agg(
        F.count("*").alias("_n"),
        stable_sum(F.col(value_col), 6).alias("_sx"),
    )
    return (
        base.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            F.col("_n").cast("long").alias("n_rows"),
            F.lit(b).cast("long").alias("b_replicas"),
            stable_round(
                F.col("_sx") / F.col("_n").cast("double"), round_to
            ).alias("mean"),
            stable_round(F.col("_lo"), round_to).alias("ci_lo"),
            stable_round(F.col("_hi"), round_to).alias("ci_hi"),
        )
    )
