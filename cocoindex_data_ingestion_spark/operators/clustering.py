"""Distributed clustering over embedding corpora.

The reference trains cluster structure implicitly (IVF coarse
quantizers, semantic-dedup cells — app/services/search_service.py's
ANN path and the SemDeDup-style cells in dedup); this module provides
the explicit iterative trainer those consumers share: Lloyd's k-means
re-expressed as DataFrame programs.

Scale shape (the MLlib discipline, reimplemented oracle-stable):

- Vectors live in LONG format ``(vec_id, dim, val)`` — posexplode →
  groupBy is one partial-agg-friendly shuffle per iteration; no
  whole-vector aggregation buffers.
- Centroids are the ONLY driver-side state: k×dim rows collected per
  iteration (k-bounded — this is not a corpus collect) and broadcast
  back, which also truncates the iteration lineage exactly where
  MLlib's trainer does.
- All floating aggregation goes through ``stable_sum``/``stable_avg``
  (fixed-point integer accumulation), so assignments and centroids
  are bit-identical across partitionings AND engines — the DuckDB
  oracle unrolls the same iterations as CTE stages and must agree
  exactly, which is the correctness contract for an iterative op
  that plain SQL can't express directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.functions.localrel import local_df

from cocoindex_data_ingestion_spark.functions.compare import (
    stable_avg,
    stable_sum,
)


def _long_form(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, dim, val) with 1-based dims — the label_centroids
    convention."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col(vec_col)).alias("dim0", "v"),
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("v").cast("double").alias("val"),
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_scale: int = 9,
    cent_round: int = 6,
) -> DataFrame:
    """Lloyd's k-means with FIXED iteration count and DETERMINISTIC
    init (the vectors with ids 1..k seed clusters 0..k-1), so the
    whole fit is a pure function of the input — reproducible and
    oracle-checkable.

    Per iteration: assignment is a broadcast join of the k×dim
    centroid table against the long corpus + one (vec_id, cluster)
    partial-agg shuffle for the squared distances; argmin via
    ``min(struct(dist, cluster))`` (ties break to the lowest cluster
    id); recompute is one (cluster, dim) shuffle of fixed-point
    means. Cost per iteration is the canonical Lloyd's bound —
    O(rows·dim·k) map work, two map-side-combined shuffles, nothing
    driver-sized except the k×dim centroids.

    Returns the final model in long format
    ``(cluster, dim, centroid, n)`` where ``n`` is the cluster size
    under the final assignment. Clusters that lose every member
    disappear from the output (deterministically, on both engines).
    """
    spark = emb.sparkSession
    long = _long_form(emb, id_col, vec_col)
    # reused 2x per iteration — cut recomputation of the explode
    long = long.localCheckpoint(eager=False)

    cent_rows = [
        (int(r["vec_id"]) - 1, int(r["dim"]), float(r["val"]))
        for r in long.filter(F.col("vec_id").between(1, k)).collect()
    ]
    return _lloyd_iterate(spark, long, cent_rows, iters, dist_scale, cent_round)


def _lloyd_iterate(
    spark,
    long: DataFrame,
    cent_rows: list,
    iters: int,
    dist_scale: int,
    cent_round: int,
) -> DataFrame:
    """The shared Lloyd loop: ``cent_rows`` is the (cluster, dim, c)
    driver-side seed state; see :func:`kmeans_fit` for the
    per-iteration plan shape."""
    schema = "cluster long, dim int, c double"
    sizes: dict = {}
    for _ in range(iters):
        cdf = local_df(spark, cent_rows, schema)
        diff = F.col("val") - F.col("c")
        dist = (
            long.join(F.broadcast(cdf), "dim")
            .groupBy("vec_id", "cluster")
            .agg(stable_sum(diff * diff, dist_scale).alias("dist"))
        )
        assign = (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select("vec_id", F.col("m.cluster").alias("cluster"))
        )
        newc = (
            long.join(assign, "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                stable_avg(F.col("val"), cent_round).alias("c"),
                F.count("val").alias("n"),
            )
        )
        rows = newc.collect()  # k*dim driver state, NOT a corpus collect
        cent_rows = [(int(r["cluster"]), int(r["dim"]), float(r["c"])) for r in rows]
        sizes = {int(r["cluster"]): int(r["n"]) for r in rows}

    out = local_df(
        spark,
        [(c, d, v, sizes[c]) for c, d, v in cent_rows],
        "cluster long, dim int, centroid double, n long",
    )
    return out.orderBy("cluster", "dim")


def kmeans_assign(
    emb: DataFrame,
    model: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_scale: int = 9,
) -> DataFrame:
    """Assign every vector to its nearest model centroid (same
    distance + tie-break discipline as the trainer). ``model`` is
    ``kmeans_fit`` output (or any ``(cluster, dim, centroid)`` long
    table); it is k-bounded, hence legitimately broadcast.

    Returns ``(vec_id, cluster, dist)`` with ``dist`` the stable
    squared L2 distance."""
    long = _long_form(emb, id_col, vec_col)
    cent = model.select("cluster", "dim", F.col("centroid").alias("c"))
    diff = F.col("val") - F.col("c")
    dist = (
        long.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cluster")
        .agg(stable_sum(diff * diff, dist_scale).alias("dist"))
    )
    return (
        dist.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cluster")).alias("m"))
        .select(
            "vec_id",
            F.col("m.cluster").alias("cluster"),
            F.col("m.dist").alias("dist"),
        )
    )


def farthest_first_seeds(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_scale: int = 9,
) -> list[int]:
    """Deterministic farthest-first traversal (Gonzalez 1985 — the
    derandomized k-means++ seeding): start from the smallest id, then
    repeatedly take the vector maximizing its distance to the nearest
    chosen seed (id tie-break). Fixes the real failure of naive
    id-based seeding — if ids 1..k all sit in one cluster, Lloyd's
    cannot split the others.

    Each of the k-1 rounds is one broadcast join against the new
    seed's dim rows + one per-vector min-distance update; the running
    ``mind`` table is localCheckpointed so lineage stays flat. All
    distances go through ``stable_sum`` — seed choice is bit-exact
    across partitionings and engines (the unrolled-CTE oracle makes
    the same picks).

    Returns the chosen seed ids in selection order (cluster 0..k-1).
    """
    long = _long_form(emb, id_col, vec_col).localCheckpoint(eager=False)
    first = emb.agg(F.min(F.col(id_col))).collect()[0][0]
    seeds = [int(first)]
    mind = None
    for _ in range(k - 1):
        seed_long = long.filter(F.col("vec_id") == seeds[-1]).select(
            "dim", F.col("val").alias("sval")
        )
        diff = F.col("val") - F.col("sval")
        d = (
            long.join(F.broadcast(seed_long), "dim")
            .groupBy("vec_id")
            .agg(stable_sum(diff * diff, dist_scale).alias("d"))
        )
        if mind is None:
            mind = d.select("vec_id", F.col("d").alias("mind"))
        else:
            mind = (
                mind.join(d, "vec_id")
                .select("vec_id", F.least("mind", "d").alias("mind"))
            )
        mind = mind.localCheckpoint(eager=False)
        nxt = (
            mind.filter(~F.col("vec_id").isin(seeds))
            .orderBy(F.desc("mind"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        seeds.append(int(nxt[0]["vec_id"]))
    return seeds


def kmeans_fit_pp(
    emb: DataFrame,
    k: int = 4,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_scale: int = 9,
    cent_round: int = 6,
) -> DataFrame:
    """Lloyd's k-means with farthest-first seeding: the seeds from
    :func:`farthest_first_seeds` become clusters 0..k-1 (selection
    order), then the same fixed-iteration trainer as
    :func:`kmeans_fit` runs. Deterministic end to end."""
    seeds = farthest_first_seeds(emb, k, id_col, vec_col, dist_scale)
    spark = emb.sparkSession
    long = _long_form(emb, id_col, vec_col).localCheckpoint(eager=False)
    order = {sid: i for i, sid in enumerate(seeds)}
    cent_rows = [
        (order[int(r["vec_id"])], int(r["dim"]), float(r["val"]))
        for r in long.filter(F.col("vec_id").isin(seeds)).collect()
    ]
    return _lloyd_iterate(
        spark, long, cent_rows, iters, dist_scale, cent_round
    )


def cluster_quality(
    emb: DataFrame,
    model: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dist_scale: int = 9,
    round_to: int = 4,
) -> DataFrame:
    """Simplified-silhouette cluster quality against a fitted model:
    per vector s = (b − a) / max(a, b) with a = euclidean distance to
    the OWN centroid and b = distance to the nearest OTHER centroid
    (the centroid-based silhouette — O(rows·k), not the O(rows²)
    pairwise original, which is the only version that exists at
    100 TB). s near 1 = tight and well-separated; near 0 =
    boundary; negative = probably mis-assigned.

    One broadcast of the k×dim model, one (vec_id, cluster) distance
    shuffle, then own/a/b extracted from ONE per-vector aggregation
    (sorted k-element struct array — no self-joins), one bounded
    output groupBy. Returns (cluster, n, avg_silhouette).
    """
    long = _long_form(emb, id_col, vec_col)
    cent = model.select("cluster", "dim", F.col("centroid").alias("c"))
    diff = F.col("val") - F.col("c")
    d = (
        long.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cluster")
        .agg(stable_sum(diff * diff, dist_scale).alias("dist"))
    )
    # ONE aggregation instead of own + b + two vec_id joins (r10):
    # each vector has exactly k distance rows, so the sorted k-element
    # struct array gives own/a at [0] (the same (dist, cluster)
    # tie-break as min(struct)) and b at [1] (the smallest distance
    # among the OTHER clusters — everything after [0] is another
    # cluster, sorted by dist). Bounded at k elements per group.
    per_vec = (
        d.groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dist", "cluster"))
            ).alias("ds")
        )
        .select(
            F.col("ds")[0]["cluster"].alias("own"),
            F.col("ds")[0]["dist"].alias("a"),
            F.col("ds")[1]["dist"].alias("b"),
        )
    )
    sa, sb = F.sqrt(F.col("a")), F.sqrt(F.col("b"))
    denom = F.greatest(sa, sb)
    s = F.when(denom > 0, (sb - sa) / denom).otherwise(F.lit(0.0))
    from cocoindex_data_ingestion_spark.functions.compare import stable_avg

    return (
        per_vec.select("own", s.alias("s"))
        .groupBy(F.col("own").alias("cluster"))
        .agg(
            F.count("*").alias("n"),
            stable_avg(F.col("s"), round_to).alias("avg_silhouette"),
        )
        .orderBy("cluster")
    )


class OnlineKMeans:
    """Mini-batch / online k-means (Sculley, WWW'10 shape): cluster
    state lives in a :class:`..plans.ivm.MaterializedAgg` as per
    ``cluster#dim`` member counts + FIXED-POINT value sums, so each
    arriving batch folds in with O(batch) work and the centroids are
    always ``sum / count`` — no revisiting of history.

    Per refresh: current centroids (k×dim, driver-collected) are
    broadcast against the batch's long form; assignment uses the
    SAME stable distance + tie-break discipline as the batch
    trainer; the assigned rows become (cluster#dim, quantized-value)
    deltas for the state. Values are quantized to 10^-6 BEFORE
    summation — integer-valued doubles sum exactly in any order, so
    the accumulated centroids are bit-identical across partitionings
    AND engines. First refresh seeds clusters 0..k-1 from the
    batch's k smallest ids (deterministic cold start).

    ``centroids()`` returns the live ``(cluster, dim, centroid, n)``
    model (same shape as :func:`kmeans_fit` output — directly usable
    by :func:`kmeans_assign` / :func:`cluster_quality`).
    """

    Q = 1_000_000.0  # fixed-point scale for value sums

    def __init__(
        self,
        spark,
        path: str,
        k: int,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dist_scale: int = 9,
        cent_round: int = 6,
    ):
        from cocoindex_data_ingestion_spark.plans.ivm import MaterializedAgg

        self.spark = spark
        self.k = k
        self.id_col, self.vec_col = id_col, vec_col
        self.dist_scale, self.cent_round = dist_scale, cent_round
        self.view = MaterializedAgg(
            spark, path, group_col="cd", sum_cols=("vq",), n_buckets=4
        )

    def centroids(self) -> DataFrame:
        from cocoindex_data_ingestion_spark.functions.compare import (
            stable_round,
        )

        return self.view.read().select(
            F.split("cd", "#")[0].cast("long").alias("cluster"),
            F.split("cd", "#")[1].cast("int").alias("dim"),
            stable_round(
                F.col("sum_vq") / F.lit(self.Q) / F.col("n"),
                self.cent_round,
            ).alias("centroid"),
            F.col("n"),
        ).orderBy("cluster", "dim")

    def refresh(self, batch: DataFrame) -> None:
        long = _long_form(batch, self.id_col, self.vec_col)
        cent = self.centroids()
        if cent.limit(1).count() == 0:
            # cold start: k smallest batch ids seed clusters 0..k-1
            seed_ids = [
                int(r[0])
                for r in batch.select(self.id_col)
                .orderBy(self.id_col)
                .limit(self.k)
                .collect()
            ]
            order = {sid: i for i, sid in enumerate(seed_ids)}
            mapping = F.create_map(
                *[F.lit(x) for kv in order.items() for x in kv]
            )
            # cold-start centroids ARE the seed vectors; every batch
            # row (seeds included, at distance 0) assigns to the
            # nearest seed
            seeds_long = long.filter(F.col("vec_id").isin(seed_ids)).select(
                F.col("vec_id").alias("sid"), "dim", F.col("val").alias("c")
            )
            cent0 = seeds_long.withColumn(
                "cluster", mapping[F.col("sid")]
            ).select("cluster", "dim", "c")
            assign = self._assign(long, cent0)
        else:
            assign = self._assign(
                long, cent.select("cluster", "dim", F.col("centroid").alias("c"))
            )
        delta = (
            long.join(assign, "vec_id")
            .select(
                F.concat_ws("#", F.col("cluster"), F.col("dim")).alias("cd"),
                (
                    F.floor(F.col("val") * F.lit(self.Q) + F.lit(0.5))
                ).cast("double").alias("vq"),
            )
        )
        self.view.refresh(inserts=delta)

    def _assign(self, long: DataFrame, cent: DataFrame) -> DataFrame:
        diff = F.col("val") - F.col("c")
        dist = (
            long.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(stable_sum(diff * diff, self.dist_scale).alias("dist"))
        )
        return (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select("vec_id", F.col("m.cluster").alias("cluster"))
        )
