"""Item-item collaborative filtering over user interaction vectors.

The classic "customers who bought X also bought Y" co-occurrence
recommender (Linden et al., IEEE Internet Computing 2003 — Amazon's
item-to-item CF): items are vectors over users, similarity is the
cosine of interaction weights, and a user's recommendations are the
similarity-weighted sum over what they already have. The reference
has no recommender; this is part of the training-data/analytics
surface a 100 TB pipeline expects next to market-basket lift
(basket_part_pairs) and user-profile similarity.

Scale shape: the corpus reduces to per-(user, item) INTEGER weights
in one shuffle; each user's vector is capped to their top-M items
(deterministic w-desc/item-asc rank) so per-user pair generation is
O(M²) map-side work, never a corpus self-join — the same bound
DIMSUM/co-occurrence systems impose. Norms and dot products stay
integers until the final cosine, so every engine computes identical
similarities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.compare import stable_round, stable_sum


def interaction_weights(
    df: DataFrame,
    user_col: str,
    item_col: str,
    max_items_per_user: int = 50,
) -> DataFrame:
    """Per-(user, item) interaction counts, capped to each user's
    ``max_items_per_user`` strongest items (w desc, item asc —
    deterministic). Output: ``(u, it, w)`` with integer ``w``."""
    ui = (
        df.select(F.col(user_col).alias("u"), F.col(item_col).alias("it"))
        .groupBy("u", "it")
        .agg(F.count("*").alias("w"))
    )
    w_rank = Window.partitionBy("u").orderBy(F.desc("w"), F.asc("it"))
    return (
        ui.withColumn("_rn", F.row_number().over(w_rank))
        .filter(F.col("_rn") <= max_items_per_user)
        .drop("_rn")
        # every consumer reads this table at least twice (baskets +
        # norms; the recommender adds the owned set) — cut the lineage
        # so the interaction scan/cap runs once, not per consumer
        .localCheckpoint(eager=False)
    )


def item_item_cosine(
    weights: DataFrame,
    min_co_users: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Pairwise item cosine similarity from capped interaction
    weights (:func:`interaction_weights` output): ``(item_a, item_b,
    n_co_users, dot, cosine)`` for item pairs sharing ≥
    ``min_co_users`` users, ``item_a < item_b``.

    Pairs are generated map-side per user from a sorted basket (the
    basket_part_pairs posexplode+slice idiom — one shuffle for the
    baskets, one for the pair aggregate); norms come from one more
    aggregation of the same capped table and join back broadcast-
    sized (items × 1 row each). dot/norms are exact integers; only
    the final cosine divides.
    """
    baskets = (
        weights.groupBy("u")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("it"), F.col("w")))
            ).alias("iw")
        )
        .select("iw")
    )
    pairs = (
        baskets.select(F.posexplode("iw").alias("i", "a"), F.col("iw"))
        .select(
            F.col("a.it").alias("item_a"),
            F.col("a.w").alias("wa"),
            F.explode(F.expr("slice(iw, i + 2, size(iw))")).alias("b"),
        )
        .select(
            "item_a",
            F.col("b.it").alias("item_b"),
            (F.col("wa") * F.col("b.w")).alias("_p"),
        )
        # pin the pair-aggregate's parallelism: co-occurrence pairs are
        # near-unique (little combiner collapse), and AQE sizes the
        # exchange from the tiny PRE-explode basket bytes — measured
        # 2 post-coalesce tasks over 11M pairs (15.1s) vs 64 pinned
        # tasks (6.1s) at sf0.1. An explicit count is exempt from AQE
        # coalescing and scales with the session's shuffle setting.
        .repartition(
            2 * int(weights.sparkSession.conf.get("spark.sql.shuffle.partitions")),
            "item_a",
            "item_b",
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.count("*").alias("n_co_users"),
            F.sum("_p").alias("dot"),
        )
        .filter(F.col("n_co_users") >= min_co_users)
    )
    n2 = weights.groupBy("it").agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    na = n2.select(F.col("it").alias("item_a"), F.col("n2").alias("_na"))
    nb = n2.select(F.col("it").alias("item_b"), F.col("n2").alias("_nb"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        pairs.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_co_users").cast("long").alias("n_co_users"),
            F.col("dot").cast("long").alias("dot"),
            stable_round(cos, round_to).alias("cosine"),
        )
    )


def recommend_items(
    weights: DataFrame,
    sims: DataFrame,
    user,
    k: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Top-k recommendations for one user: score every candidate item
    by ``Σ_owned cosine(owned, cand) · w_owned`` over the user's own
    items, excluding items they already have. The owned set is a
    broadcast (≤ the per-user cap by construction); the similarity
    table is symmetrized on the fly."""
    owned = weights.filter(F.col("u") == user).select("it", "w")
    # the union reads sims twice; checkpoint so the pair pipeline
    # (the expensive leg) executes once
    sims = sims.localCheckpoint(eager=False)
    sym = sims.select(
        F.col("item_a").alias("src"), F.col("item_b").alias("cand"), "cosine"
    ).union(
        sims.select(
            F.col("item_b").alias("src"), F.col("item_a").alias("cand"), "cosine"
        )
    )
    scored = (
        sym.join(
            F.broadcast(owned.select(F.col("it").alias("src"), "w")), "src"
        )
        .join(
            F.broadcast(owned.select(F.col("it").alias("cand"))),
            "cand",
            "left_anti",
        )
        .groupBy("cand")
        .agg(
            # per-path products are identical doubles (rounded cosine ×
            # integer weight); the SUM must be order-independent, so it
            # runs through the fixed-point stable_sum discipline
            stable_round(
                stable_sum(F.col("cosine") * F.col("w").cast("double"), 6),
                round_to,
            ).alias("score"),
            F.count("*").cast("long").alias("n_paths"),
        )
    )
    return (
        scored.select(F.col("cand").alias("item"), "score", "n_paths")
        .orderBy(F.desc("score"), F.asc("item"))
        .limit(k)
    )
