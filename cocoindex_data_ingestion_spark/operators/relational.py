"""General relational layer: the operators the reference's query
programs decompose into (SURVEY §2.8), exposed as a thin typed facade
over native DataFrame ops — Spark *is* this layer; the value added
here is scale-aware composition (as-of, range join, sessionize,
top-k per group) with documented physical strategies.

Reference parity notes: the reference has no general join/agg/window
operators; its fusion joins (qdrant_service.py:327-362), dedup
self-joins (neo4j_service.py:369-375) and rank maps
(search_service.py:381-383) are all instances of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutil import ts_us


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_col: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Top-k rows per group via row_number window.

    Physical plan: one shuffle on group_cols, per-partition sort.
    At 100 TB with few groups this skews; pre-aggregate or use
    AQE skew handling. With many groups it scales linearly.
    """
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    keys = [order] + ([F.col(tiebreak_col).asc()] if tiebreak_col else [])
    w = Window.partitionBy(*group_cols).orderBy(*keys)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tiebreak: str | None = None,
    left_key: str | list[str] | None = None,
    max_lookback_us: int | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (backward) sharing the equi-key.

    Strategy: equi-join on key + inequality filter + window
    row_number — correct and fully Catalyst-planned (sort-merge on
    the key).

    ``left_key``: column(s) uniquely identifying a left row — the
    window partitions on it (plus the equi-key). Without it a
    synthetic per-row id is generated; partitioning on every left
    column would silently collapse duplicate left rows and hash wide
    rows for nothing.

    ``max_lookback_us`` bounds the candidate blow-up for keys with
    huge history: both sides get a coarse time bucket of that width
    added to the join key (right rows are emitted into their own and
    the following bucket), so each left row joins at most the
    history inside its lookback window instead of ALL earlier rows —
    the O(n·m)→O(n·w) rewrite that matters at 100 TB. Left rows with
    no match inside the window are dropped (bounded-as-of contract).
    """
    lkeys = (
        [left_key] if isinstance(left_key, str)
        else list(left_key) if left_key
        else None
    )
    if lkeys is None:
        left = left.withColumn("_asof_lid", F.monotonically_increasing_id())
        lkeys = ["_asof_lid"]

    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    backward = direction == "backward"
    time_cond = rt <= lt if backward else rt >= lt

    if max_lookback_us is not None:
        bw = int(max_lookback_us)
        shift = 1 if backward else -1
        left = left.withColumn(
            "_asof_b", F.floor(ts_us(left_ts) / bw)
        )
        right = right.withColumn(
            "_asof_b0", F.floor(ts_us(right_ts) / bw)
        ).withColumn(
            "_asof_b",
            F.explode(
                F.array(F.col("_asof_b0"), F.col("_asof_b0") + shift)
            ),
        ).drop("_asof_b0")
        win_cond = (
            (ts_us(lt) - ts_us(rt) < bw)
            if backward
            else (ts_us(rt) - ts_us(lt) < bw)
        )
        cond = (
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col("l._asof_b") == F.col("r._asof_b"))
            & time_cond
            & win_cond
        )
    else:
        cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & time_cond

    joined = left.alias("l").join(right.alias("r"), cond, "inner")
    order = [rt.desc() if backward else rt.asc()]
    if tiebreak:
        order.append(F.col(f"r.{tiebreak}").desc())
    w = Window.partitionBy(
        F.col(f"l.{on}"), *[F.col(f"l.{c}") for c in lkeys]
    ).orderBy(*order)
    out = joined.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    for helper in ("_asof_lid", "_asof_b"):
        for side in ("l", "r"):
            try:
                out = out.drop(F.col(f"{side}.{helper}"))
            except Exception:
                pass
    return out


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant aggregation: two-phase groupBy with a random
    salt — partial agg on (key, salt) spreads a hot key over
    ``n_salts`` reducers, the final agg on key combines partials.

    ``aggs``: out_col -> (fn, in_col) with fn in {sum, count, min,
    max} (the decomposable aggregates; avg = sum/count composed by
    the caller). Results are identical to a direct groupBy — the
    salt only changes the physical distribution, which is why the
    DuckDB oracle for a salted query is the plain GROUP BY.

    At 100 TB this is the manual fallback when AQE skew handling
    can't help (first-stage aggregation skew, not join skew).
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial_aggs = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_aggs.append(F.count(col).alias(f"_p_{out}"))
        else:
            partial_aggs.append(getattr(F, fn)(col).alias(f"_p_{out}"))
    partial = salted.groupBy(*group_cols, "_salt").agg(*partial_aggs)

    final_aggs = []
    for out, (fn, _col) in aggs.items():
        refn = "sum" if fn == "count" else fn
        final_aggs.append(getattr(F, refn)(f"_p_{out}").alias(out))
    return partial.groupBy(*group_cols).agg(*final_aggs)


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    id_tiebreak: str = "event_id",
) -> DataFrame:
    """Gap-based sessionization: new session when the gap to the
    previous event of the same key exceeds the threshold.

    lag + running-sum over one (key, ts) window — a single shuffle
    on key, then map-side session aggregation. Time arithmetic in
    integer micros for cross-engine determinism.
    """
    us = ts_us(ts_col)
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_tiebreak).asc())
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = events.withColumn(
        "new_sess",
        F.when(
            F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
        ).otherwise(0),
    )
    return with_flag.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("new_sess")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the manual fallback when the small
    side is too big to broadcast AND AQE's skew-join splitting can't
    engage (e.g. the skew is concentrated in one un-splittable
    build-side partition, or AQE is off).

    LEFT (the skewed fact side) gets a deterministic per-row salt in
    [0, n_salts); RIGHT is replicated n_salts times; the join runs on
    (key, salt), spreading each hot key over ``n_salts`` reducers.
    Row multiset is IDENTICAL to the plain join (each left row meets
    each matching right row exactly once — at its own salt), which is
    the equivalence contract tests pin. Cost: right side is read
    n_salts times heavier — size the salt count to the skew factor,
    not higher.

    The salt is hash-derived from the full left row id space (not
    rand()), so retries/replays salt identically — safe inside
    foreachBatch."""
    salt_vals = F.array(*[F.lit(i) for i in range(n_salts)])
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts)),
    )
    r = right.withColumn("_salt", F.explode(salt_vals))
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: collapse each key's
    attribute timeline into validity intervals
    (version, attr, valid_from_us, valid_to_us, is_current) — the
    warehouse-standard change-capture rollup a training-data pipeline
    uses to reconstruct point-in-time state (and the batch twin of
    the streaming keyed-upsert in streaming/events.py).

    Gaps-and-islands via lag + running sum (two window passes over
    ONE partitioning — a single shuffle on the key; Spark reuses the
    sort between the two windows), then a groupBy on (key, version)
    and a final lead over versions. At 100 TB the only movement is
    the one shuffle on ``key_col``; all runs stay within partitions.
    """
    base = events.select(
        F.col(key_col), F.col(id_col), ts_us(ts_col).alias("_us"), F.col(attr_col)
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("_us").asc(), F.col(id_col).asc()
    )
    prev = F.lag(F.col(attr_col)).over(w)
    chg = F.when(prev.isNull() | (prev != F.col(attr_col)), 1).otherwise(0)
    runs = base.withColumn("_chg", chg).withColumn(
        "version",
        F.sum("_chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grouped = runs.groupBy(key_col, "version").agg(
        F.min(attr_col).alias(attr_col),
        F.min("_us").alias("valid_from_us"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy(F.col("version").asc())
    valid_to = F.lead("valid_from_us").over(wv)
    return grouped.select(
        key_col,
        "version",
        attr_col,
        "valid_from_us",
        valid_to.alias("valid_to_us"),
        "n_events",
        valid_to.isNull().alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str = "ts_us",
    valid_from_col: str = "valid_from_us",
    valid_to_col: str = "valid_to_us",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal) join: attach to each fact row the
    dimension version whose validity interval contains the fact's
    timestamp — the lookup every SCD2 dimension exists for.

    ``valid_to_col`` NULL means the open/current interval. Intervals
    per key are disjoint (scd2_history's contract), so each fact
    matches at most one version.

    Plan shape: an equi-join on ``key_col`` (ONE shuffle, or zero
    with both sides bucketed by key) with the interval containment
    as a post-join filter — each key's versions are few (bounded by
    its change count), so the per-key cross-section is tiny and
    nothing about the predicate breaks sort-merge/broadcast
    selection. Never a cross join.
    """
    f, d = facts.alias("f"), dim.alias("d")
    cond = (
        (F.col(f"f.{key_col}") == F.col(f"d.{key_col}"))
        & (F.col(f"d.{valid_from_col}") <= F.col(f"f.{fact_ts_col}"))
        & (
            F.col(f"d.{valid_to_col}").isNull()
            | (F.col(f"f.{fact_ts_col}") < F.col(f"d.{valid_to_col}"))
        )
    )
    return f.join(d, cond, how)


def zscore_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float = 2.5,
    min_group: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Per-group z-score anomaly detection: rows whose value deviates
    more than ``threshold`` sample standard deviations from their
    group mean (the per-user/per-metric outlier pass of an event
    analytics pipeline).

    Numerics are engine-portable BY CONSTRUCTION: mean and variance
    derive from stable-rounded Σx and Σx² (never an engine's own
    avg/stddev, whose summation orders differ), so the Spark result
    and a DuckDB oracle agree bit-for-bit including at threshold
    boundaries. Variance uses the sample (n−1) form.

    Plan: the group moments come from an unbounded window PARTITIONED
    BY the group key — ONE shuffle total (a groupBy + join-back shape
    would shuffle twice and the moment table is corpus-key-sized, so
    it could never broadcast). The fixed-point element rounding makes
    the windowed sums order-independent, so the result matches a
    GROUP-BY oracle exactly. Groups under ``min_group`` rows are
    skipped (a z-score over 2 points is noise).
    """
    from pyspark.sql import Window

    from ..functions.compare import stable_round

    w = Window.partitionBy(*group_cols)
    v = F.col(value_col).cast("double")
    p = 1e6  # stable_sum's elem scale, inlined for the window form
    q = F.floor(v * F.lit(p) + F.lit(0.5)).cast("long")
    qq = F.floor(v * v * F.lit(p) + F.lit(0.5)).cast("long")
    ann = (
        df.withColumn("_n", F.count("*").over(w))
        .withColumn("_s", F.sum(q).over(w) / F.lit(p))
        .withColumn("_ss", F.sum(qq).over(w) / F.lit(p))
        .filter(F.col("_n") >= min_group)
    )
    mean = F.col("_s") / F.col("_n")
    var = (F.col("_ss") - F.col("_n") * mean * mean) / (F.col("_n") - 1)
    z = (v - mean) / F.sqrt(var)
    # var > 0 filtered BEFORE sqrt so no NaN is ever produced — DuckDB
    # orders NaN above everything while Spark's comparison is false, so
    # a NaN reaching the threshold comparison would diverge engines
    return (
        ann.filter(
            (F.col("_ss") - F.col("_s") * F.col("_s") / F.col("_n")) > 0
        )
        .withColumn("zscore", stable_round(z, round_to))
        .filter(F.abs(F.col("zscore")) > threshold)
        .drop("_n", "_s", "_ss")
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Shuffle-key skew diagnostics: the top heavy-hitter keys with
    their share of the table and a suggested salt factor — the
    planning input for :func:`salted_agg` / :func:`salted_join` (and
    for judging whether AQE's skew-join split will engage).

    One map-side-combined groupBy on the key; the per-key count table
    is keys-sized, its summary (total rows, key count) a broadcast
    scalar; the top-N is a distributed TakeOrdered, and the only
    window runs over the N returned rows. salt_factor =
    ceil(n·n_keys/total) in exact integer arithmetic — how many
    partitions this key's rows need to look like an average key.

    Returns ``(rank, key, n, share, cum_share, salt_factor)`` rank
    ascending."""
    from cocoindex_data_ingestion_spark.functions.compare import stable_round

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    summary = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_keys")
    )
    topn = (
        counts.orderBy(F.desc("n"), F.asc("key"))
        .limit(top)
        .crossJoin(F.broadcast(summary))
    )
    w = Window.orderBy(F.desc("n"), F.asc("key")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        topn.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n"), F.asc("key"))
            ).cast("long"),
        )
        .select(
            "rank",
            "key",
            "n",
            stable_round(F.col("n") / F.col("total"), round_to).alias("share"),
            stable_round(F.sum("n").over(w) / F.col("total"), round_to).alias(
                "cum_share"
            ),
            F.expr("(n * n_keys + total - 1) div total").alias("salt_factor"),
        )
    )


def group_linear_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line from closed-form
    moment sums — the scale shape for "is this metric drifting up"
    over billions of rows: ONE map-side-combined groupBy collecting
    (n, Σx, Σy, Σxy, Σx², Σy²), slope/intercept/R² derived from the
    six scalars. No window, no per-group iteration.

    The x values should be pre-normalized to a small range (e.g.
    hours since the group's start) — the fixed-point moment sums
    need |x·y|·10⁶ within long headroom. All six moments go through
    ``stable_sum``, so the derived coefficients are bit-identical
    across partitionings and engines.

    Returns (group..., n, slope, intercept, r2); groups with zero
    x-variance report null slope/intercept/r2 (vertical line)."""
    from cocoindex_data_ingestion_spark.functions.compare import (
        stable_round, stable_sum,
    )

    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    g = df.groupBy(*group_cols).agg(
        F.count("*").cast("double").alias("n"),
        stable_sum(x, 6).alias("sx"),
        stable_sum(y, 6).alias("sy"),
        stable_sum(x * y, 6).alias("sxy"),
        stable_sum(x * x, 6).alias("sxx"),
        stable_sum(y * y, 6).alias("syy"),
    )
    n = F.col("n")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    sst = n * F.col("syy") - F.col("sy") * F.col("sy")
    ssr = slope * slope * denom
    r2 = F.when(sst > 0, ssr / sst)
    return g.select(
        *group_cols,
        n.cast("long").alias("n"),
        stable_round(F.when(denom > 0, slope), round_to).alias("slope"),
        stable_round(F.when(denom > 0, intercept), round_to).alias(
            "intercept"
        ),
        stable_round(F.when(denom > 0, r2), round_to).alias("r2"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    pk: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """CDC-style diff of two snapshots of the same table: one row per
    pk whose state differs, tagged ``added`` / ``removed`` /
    ``changed``, with the old/new value of every compared column
    (nulls on the absent side).

    The reference's export targets reconcile snapshots the same way
    before MERGE (src/execution/row_indexer.rs precommit diff;
    sinks.py reproduces the apply side) — this is the standalone
    diff operator for auditing/driving that reconciliation.

    Physical plan: ONE co-partitioned full-outer join on the pk (SMJ;
    shuffle-free when both sides are bucketed by pk, skew handled by
    AQE). Change detection is null-safe column comparison — no window,
    no second pass. At 100 TB the diff output is proportional to the
    churn, not the table.
    """
    o = old.select(
        *[F.col(c) for c in pk],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c) for c in pk],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, pk, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~(F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}")))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type") != "unchanged")
        .select(
            *pk,
            "change_type",
            *[c for cc in compare_cols for c in (f"old_{cc}", f"new_{cc}")],
        )
    )


def skyline_2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    count_col: str = "n_rows",
) -> DataFrame:
    """2-D Pareto frontier (skyline): the (min_col, max_col) pairs not
    dominated by any other row — q dominates p when q.min <= p.min and
    q.max >= p.max with at least one strict. Returns one row per
    frontier point with the number of source rows at that point.

    Scale shape — NOT the O(n^2) domination anti-join and NOT a global
    no-partition window:
    1. collapse to per-pair counts, then the per-min_col max curve
       (two domain-bounded aggregations);
    2. range-repartition the curve so partition order == global order,
       freeze partition ids, and compute the strictly-preceding
       running max as per-partition window + broadcast prefix-max of
       the preceding partitions (distributed prefix scan, the
       as_ltable discipline — datamodel.as_ltable);
    3. a curve point survives iff every strictly-cheaper point has a
       strictly-smaller max.
    """
    pairs = df.groupBy(min_col, max_col).agg(F.count("*").alias(count_col))
    curve = pairs.groupBy(min_col).agg(F.max(max_col).alias("_ymax"))
    part = (
        curve.repartitionByRange(F.col(min_col).asc())
        .sortWithinPartitions(F.col(min_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pmax = part.groupBy("_pid").agg(F.max("_ymax").alias("_pm"))
    # window over #partitions rows — bounded by cluster size
    w_prev = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    prev = pmax.select("_pid", F.max("_pm").over(w_prev).alias("_prev_max"))
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(F.col(min_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = F.greatest(
        F.max("_ymax").over(w_local), F.col("_prev_max")
    )
    sky = (
        part.join(F.broadcast(prev), "_pid")
        .withColumn("_run", run)
        .filter(F.col("_run").isNull() | (F.col("_run") < F.col("_ymax")))
        .select(min_col, F.col("_ymax").alias(max_col))
    )
    return sky.join(pairs, [min_col, max_col])


def column_profile(
    df: DataFrame, cols: list[str], round_to: int = 4
) -> DataFrame:
    """ANALYZE-style numeric column profile: one row per column with
    ``(col_name, n_rows, n_null, ndv, min_v, max_v, p25, p50, p75)``.
    The optimizer-statistics / data-quality-dashboard primitive.

    Physical plan: ONE wide aggregate over a single table scan — every
    statistic for every column is a scalar agg in the same pass, and
    the long format comes from exploding the single result row (free).
    The exact ``count(distinct)`` per column plans as Expand (stream
    x C); at 100 TB swap ``exact_ndv=False``-style profiling in by
    replacing it with ``approx_count_distinct`` (HLL, no Expand) —
    exact here because the oracle compares values.
    """
    from ..functions.compare import stable_round

    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c).cast("double")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nnull"),
            F.countDistinct(col).alias(f"{c}__ndv"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            F.percentile(col, F.lit(0.25)).alias(f"{c}__p25"),
            F.percentile(col, F.lit(0.5)).alias(f"{c}__p50"),
            F.percentile(col, F.lit(0.75)).alias(f"{c}__p75"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"{c}__nnull").cast("long").alias("n_null"),
            F.col(f"{c}__ndv").cast("long").alias("ndv"),
            F.col(f"{c}__min").alias("min_v"),
            F.col(f"{c}__max").alias("max_v"),
            stable_round(F.col(f"{c}__p25"), round_to).alias("p25"),
            stable_round(F.col(f"{c}__p50"), round_to).alias("p50"),
            stable_round(F.col(f"{c}__p75"), round_to).alias("p75"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def seasonal_profile(
    df: DataFrame,
    us_col: str,
    value_col: str,
    group_cols: list[str],
    round_to: int = 4,
) -> DataFrame:
    """Weekly seasonal decomposition baseline: per (group, day-of-week,
    hour-of-day) the seasonal mean of ``value_col`` and the mean
    absolute residual against it — the seasonal-naive forecaster /
    anomaly baseline for event streams.

    Time fields come from pure integer epoch arithmetic
    (``(us - us%D)/D`` is an exact-integer-valued double, so both
    engines agree bit-for-bit; no calendar functions whose week
    conventions differ). Plan: one cell aggregation (bounded:
    |groups| x 168 rows), the profile BROADCAST back onto the stream
    (no re-shuffle of the events), then the residual aggregation —
    two stream-sized exchanges total.
    """
    from ..functions.compare import stable_avg

    day_us = 86_400_000_000
    hr_us = 3_600_000_000
    us = F.col(us_col)
    cells = df.select(
        *group_cols,
        (((us - us % day_us) / day_us).cast("long") + 4).alias("_day4"),
        (((us - us % hr_us) / hr_us).cast("long") % 24).alias("hour"),
        F.col(value_col).alias("_v"),
    ).withColumn("dow", F.col("_day4") % 7).drop("_day4")
    keys = [*group_cols, "dow", "hour"]
    prof = cells.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        stable_avg(F.col("_v"), round_to).alias("seasonal_avg"),
    )
    return (
        cells.join(F.broadcast(prof), keys)
        .groupBy(*keys, "n", "seasonal_avg")
        .agg(
            stable_avg(
                F.abs(F.col("_v") - F.col("seasonal_avg")), round_to
            ).alias("mae")
        )
    )


def chi2_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 4,
) -> DataFrame:
    """Chi-square test of independence between two categorical
    columns, returning ONE row ``(n, dof, chi2, cramers_v)`` — the
    categorical-association profile a data-quality/feature audit runs
    over label-ish columns (the numeric sibling of
    ``lineitem_corr_matrix``).

    Plan: one groupBy on ``(a, b)`` reduces the corpus to the
    contingency table (|A|·|B| rows — tiny by definition of
    "categorical"); margins and the total are re-aggregations of that
    table, broadcast back onto it. Exactly one corpus-wide shuffle.
    The chi-square statistic is a ``stable_sum`` over per-cell terms
    — each term is the same IEEE expression on the same exact integer
    counts in both engines, so the statistic is engine-identical
    before rounding.
    """
    from ..functions.compare import stable_round, stable_sum

    obs = (
        df.groupBy(col_a, col_b)
        .agg(F.count("*").alias("o"))
        # the contingency table feeds four consumers (margins x2,
        # total, cells); it is tiny — pin it
        .localCheckpoint(eager=False)
    )
    ra = obs.groupBy(col_a).agg(F.sum("o").alias("_ra"))
    cb = obs.groupBy(col_b).agg(F.sum("o").alias("_cb"))
    tot = obs.agg(
        F.sum("o").alias("_n"),
        F.countDistinct(col_a).alias("_ka"),
        F.countDistinct(col_b).alias("_kb"),
    )
    # double-multiply BEFORE dividing, matching the oracle's
    # CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) shape exactly — a long
    # product rounds differently than a double product, and would
    # overflow int64 near 1e10 rows anyway
    e = (
        F.col("_ra").cast("double")
        * F.col("_cb").cast("double")
        / F.col("_n").cast("double")
    )
    term = (F.col("o") - e) * (F.col("o") - e) / e
    # expand to the FULL category cross-product: an (a, b) combination
    # with zero observations still contributes (0 - e)^2 / e = e to the
    # statistic — dropping empty cells silently halves chi2 on
    # perfectly-associated data
    cells = (
        ra.crossJoin(F.broadcast(cb))
        .join(F.broadcast(obs), [col_a, col_b], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    return cells.groupBy("_n", "_ka", "_kb").agg(
        stable_sum(term, 6).alias("_chi2")
    ).select(
        F.col("_n").cast("long").alias("n"),
        ((F.col("_ka") - 1) * (F.col("_kb") - 1)).cast("long").alias("dof"),
        stable_round(F.col("_chi2"), round_to).alias("chi2"),
        stable_round(
            F.sqrt(
                F.col("_chi2")
                / (
                    F.col("_n").cast("double")
                    * F.least(F.col("_ka") - 1, F.col("_kb") - 1).cast("double")
                )
            ),
            round_to,
        ).alias("cramers_v"),
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merged-interval coverage per key (gaps-and-islands over
    half-open numeric intervals ``[start, end)``): overlapping or
    touching intervals union into islands; returns
    ``(key, n_intervals, n_merged, coverage)`` where ``coverage`` is
    the total length of the union — per-user active time, sensor
    uptime, valid-span audits.

    Plan: everything after the scan is partitioned by ``key`` — one
    exchange, two ordered windows (running max-end for island breaks,
    running sum for island ids), one groupBy. No self-joins: the
    classic interval-overlap self-join is O(n²) per key and
    unnecessary for union semantics.
    """
    from pyspark.sql import Window

    s, e = F.col(start_col).cast("long"), F.col(end_col).cast("long")
    base = df.select(F.col(key_col), s.alias("_s"), e.alias("_e"))
    prev = (
        Window.partitionBy(key_col)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = Window.partitionBy(key_col).orderBy("_s", "_e")
    prev_max = F.max("_e").over(prev)
    isl = base.withColumn(
        "_ni",
        F.when(prev_max.isNull() | (F.col("_s") > prev_max), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("_gid", F.sum("_ni").over(run))
    merged = isl.groupBy(key_col, "_gid").agg(
        F.count("*").alias("_cnt"),
        F.min("_s").alias("_ms"),
        F.max("_e").alias("_me"),
    )
    return merged.groupBy(key_col).agg(
        F.sum("_cnt").alias("n_intervals"),
        F.count("*").alias("n_merged"),
        F.sum(F.col("_me") - F.col("_ms")).alias("coverage"),
    )


def ks_test_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    round_to: int = 4,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test: ``D = sup_v |F_a(v) -
    F_b(v)|`` over the empirical CDFs, plus the standard asymptotic
    p-value (Stephens' lambda, five-term Kolmogorov series) — the
    distribution-drift check a data pipeline runs between two cohorts
    or two ingestion batches of a numeric column.

    Scale shape: the corpus reduces to per-DISTINCT-VALUE counts in
    one shuffle; the global running counts then use the ``as_ltable``
    partition-offset pattern (range repartition on the value,
    per-partition running sums, per-partition totals broadcast as
    offsets) — NEVER a no-partition window, so the cumsum stays
    distributed at any cardinality. The supremum only needs
    evaluation at distinct observed values (ECDFs are step
    functions).

    Counts are integers so the running sums are exact; the final
    ratios/abs/max are identical IEEE ops in any engine.
    """
    from pyspark.sql import Window

    from ..functions.compare import stable_round

    s = df.filter(F.col(group_col).isin([group_a, group_b])).select(
        F.col(value_col).alias("_v"),
        F.when(F.col(group_col) == group_a, F.lit(1))
        .otherwise(F.lit(0))
        .alias("_ia"),
    )
    per = (
        s.groupBy("_v")
        .agg(
            F.sum("_ia").alias("_ca"),
            (F.count("*") - F.sum("_ia")).alias("_cb"),
        )
        # feeds the cumsum AND the totals
        .localCheckpoint(eager=False)
    )
    ordered = (
        per.repartitionByRange(F.col("_v"))
        .sortWithinPartitions("_v")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    ptot = ordered.groupBy("_pid").agg(
        F.sum("_ca").alias("_pa"), F.sum("_cb").alias("_pb")
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = ptot.select(
        "_pid",
        F.coalesce(F.sum("_pa").over(w_off), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_pb").over(w_off), F.lit(0)).alias("_ob"),
    )
    w_local = Window.partitionBy("_pid").orderBy("_v")
    tot = per.agg(
        F.sum("_ca").alias("_na"), F.sum("_cb").alias("_nb")
    )
    cum = (
        ordered.join(F.broadcast(offs), "_pid")
        .select(
            (F.sum("_ca").over(w_local) + F.col("_oa")).alias("_cuma"),
            (F.sum("_cb").over(w_local) + F.col("_ob")).alias("_cumb"),
        )
        .crossJoin(F.broadcast(tot))
    )
    diff = F.abs(
        F.col("_cuma") / F.col("_na").cast("double")
        - F.col("_cumb") / F.col("_nb").cast("double")
    )
    d = cum.groupBy("_na", "_nb").agg(F.max(diff).alias("_d"))
    ne = (
        F.col("_na").cast("double")
        * F.col("_nb").cast("double")
        / (F.col("_na") + F.col("_nb")).cast("double")
    )
    lam = (
        (F.sqrt(ne) + F.lit(0.12) + F.lit(0.11) / F.sqrt(ne)) * F.col("_d")
    )
    p = F.lit(2.0) * (
        F.exp(F.lit(-2.0) * lam * lam)
        - F.exp(F.lit(-8.0) * lam * lam)
        + F.exp(F.lit(-18.0) * lam * lam)
        - F.exp(F.lit(-32.0) * lam * lam)
        + F.exp(F.lit(-50.0) * lam * lam)
    )
    return d.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        stable_round(F.col("_d"), round_to).alias("d_stat"),
        stable_round(F.greatest(F.least(p, F.lit(1.0)), F.lit(0.0)), round_to).alias(
            "p_approx"
        ),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 4,
) -> DataFrame:
    """Mutual information between two categorical columns with the
    sqrt-entropy normalization: ``(n, mi, h_a, h_b, nmi)`` — the
    information-theoretic sibling of :func:`chi2_independence`
    (chi-square asks "is there association", MI measures how many
    nats of one column the other reveals; feature-selection and
    leakage audits want both).

    Same plan as chi2: ONE corpus shuffle to the contingency table;
    margins, entropies and the MI sum are all re-aggregations of that
    tiny table. Zero cells contribute 0 to MI by definition (the
    0·ln 0 limit), so only observed cells are summed. Per-cell/
    per-margin terms go through ``stable_sum`` so the statistic is
    order-independent; ``ln`` runs on identical doubles in both
    engines (the quality_bigram_logprob precedent).
    """
    from ..functions.compare import stable_round, stable_sum

    obs = (
        df.groupBy(col_a, col_b)
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=False)
    )
    ra = obs.groupBy(col_a).agg(F.sum("o").alias("_ra"))
    cb = obs.groupBy(col_b).agg(F.sum("o").alias("_cb"))
    tot = obs.agg(F.sum("o").alias("_n"))

    def _entropy(margin: DataFrame, cnt: str, out: str) -> DataFrame:
        p = F.col(cnt).cast("double") / F.col("_n").cast("double")
        return (
            margin.crossJoin(F.broadcast(tot))
            .agg(stable_sum(-p * F.log(p), 9).alias(out))
        )

    ha = _entropy(ra, "_ra", "h_a")
    hb = _entropy(cb, "_cb", "h_b")
    pj = F.col("o").cast("double") / F.col("_n").cast("double")
    lift = (
        F.col("o").cast("double") * F.col("_n").cast("double")
    ) / (F.col("_ra").cast("double") * F.col("_cb").cast("double"))
    cells = (
        obs.join(F.broadcast(ra), col_a)
        .join(F.broadcast(cb), col_b)
        .crossJoin(F.broadcast(tot))
    )
    mi = cells.groupBy("_n").agg(
        stable_sum(pj * F.log(lift), 9).alias("_mi")
    )
    return (
        mi.crossJoin(F.broadcast(ha))
        .crossJoin(F.broadcast(hb))
        .select(
            F.col("_n").cast("long").alias("n"),
            stable_round(F.col("_mi"), round_to).alias("mi"),
            stable_round(F.col("h_a"), round_to).alias("h_a"),
            stable_round(F.col("h_b"), round_to).alias("h_b"),
            stable_round(
                F.col("_mi") / F.sqrt(F.col("h_a") * F.col("h_b")), round_to
            ).alias("nmi"),
        )
    )


def survival_km(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    entry_type: str = "signup",
    event_type: str = "purchase",
    round_to: int = 6,
) -> DataFrame:
    """Kaplan-Meier survival estimate of time-to-conversion: subjects
    enter at their first ``entry_type`` event; the "death" is their
    first ``event_type`` at or after entry; subjects with no
    conversion are right-censored at the stream's last observed
    timestamp. Returns one row per event time ``t_day`` (days since
    entry) with the risk set, event/censor counts and the KM
    product-limit estimate — the time-to-event view a growth or
    reliability pipeline layers over raw funnels (funnel counts
    ignore censoring; KM does not).

    Scale shape: two user-keyed aggregations (entry leg, first-event
    leg — co-partitioned after the first shuffle) reduce the corpus
    to ONE ROW PER SUBJECT; the KM table itself then groups those
    rows by duration-in-days, which is CALENDAR-BOUNDED (the window
    over it is k-bounded, never corpus-sized — same adjudication as
    pq_codebook). The product limit is computed exactly: per-step
    log factors are fixed-point-quantized at 1e9 and cumulative-
    summed in integer arithmetic, so the running product is
    order-independent and engine-identical; a risk set that hits
    zero survivors switches to an exact 0.0 via a cumulative flag
    rather than ln(0).
    """
    from ..functions.compare import stable_round

    us = ts_us(F.col(ts_col))
    ev = df.select(
        F.col(user_col).alias("_u"), us.alias("_us"), F.col(type_col).alias("_t")
    )
    entries = (
        ev.filter(F.col("_t") == entry_type)
        .groupBy("_u")
        .agg(F.min("_us").alias("_entry"))
    )
    firsts = (
        ev.filter(F.col("_t") == event_type)
        .join(entries, "_u")
        .filter(F.col("_us") >= F.col("_entry"))
        .groupBy("_u")
        .agg(F.min("_us").alias("_event"))
    )
    cmax = ev.agg(F.max("_us").alias("_cmax"))
    subj = (
        entries.join(firsts, "_u", "left")
        .crossJoin(F.broadcast(cmax))
        .select(
            F.floor(
                (F.coalesce(F.col("_event"), F.col("_cmax")) - F.col("_entry"))
                / F.lit(86_400_000_000.0)
            )
            .cast("long")
            .alias("t_day"),
            F.when(F.col("_event").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("_obs"),
        )
    )
    km = subj.groupBy("t_day").agg(
        F.sum("_obs").alias("d_events"),
        (F.count("*") - F.sum("_obs")).alias("n_censored"),
    )
    tot = subj.agg(F.count("*").alias("_n0"))
    w_prev = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t_day").rowsBetween(Window.unboundedPreceding, 0)
    stepped = (
        km.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("_n0")
            - F.coalesce(
                F.sum(F.col("d_events") + F.col("n_censored")).over(w_prev),
                F.lit(0),
            ),
        )
        .withColumn(
            "_lnq",
            F.when(
                (F.col("d_events") > 0) & (F.col("n_risk") > F.col("d_events")),
                F.floor(
                    F.log(
                        (F.col("n_risk") - F.col("d_events")).cast("double")
                        / F.col("n_risk").cast("double")
                    )
                    * F.lit(1e9)
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_dead",
            F.when(
                (F.col("d_events") > 0) & (F.col("n_risk") <= F.col("d_events")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "survival",
            F.when(F.max("_dead").over(w_cum) == 1, F.lit(0.0)).otherwise(
                F.exp(F.sum("_lnq").over(w_cum) / F.lit(1e9))
            ),
        )
    )
    return (
        stepped.filter(F.col("d_events") > 0)
        .select(
            "t_day",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d_events").cast("long").alias("d_events"),
            F.col("n_censored").cast("long").alias("n_censored"),
            stable_round(F.col("survival"), round_to).alias("survival"),
        )
        .orderBy("t_day")
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    value_norm: float = 1.0,
    round_to: int = 4,
) -> DataFrame:
    """Welch's unequal-variance t-test between two cohorts of a
    numeric column: ``(n_a, n_b, mean_a, mean_b, t_stat, dof)`` with
    the Welch-Satterthwaite degrees of freedom — the A/B-test
    primitive next to :func:`chi2_independence` (categorical) and
    :func:`ks_test_2samp` (full-distribution).

    ONE corpus scan: both cohorts' count/sum/sum-of-squares come from
    a single conditional aggregate. The t statistic is invariant
    under constant rescaling of the values, so inputs are divided by
    ``value_norm`` first (pick ~the column's magnitude) — with O(1)
    normalized values the fixed-point element quantization at 1e6
    keeps the exact integer running sums inside long headroom to
    ~1e12 rows (the lineitem_corr_matrix overflow discipline).
    Means are reported on the original scale.
    """
    from ..functions.compare import stable_round, stable_sum

    v = F.col(value_col) / F.lit(float(value_norm))
    ia = F.when(F.col(group_col) == group_a, F.lit(1)).otherwise(F.lit(0))
    ib = F.when(F.col(group_col) == group_b, F.lit(1)).otherwise(F.lit(0))
    row = df.filter(F.col(group_col).isin([group_a, group_b])).agg(
        F.sum(ia).alias("_na"),
        F.sum(ib).alias("_nb"),
        stable_sum(F.when(ia == 1, v).otherwise(F.lit(0.0)), 6).alias("_sa"),
        stable_sum(F.when(ib == 1, v).otherwise(F.lit(0.0)), 6).alias("_sb"),
        stable_sum(F.when(ia == 1, v * v).otherwise(F.lit(0.0)), 6).alias("_qa"),
        stable_sum(F.when(ib == 1, v * v).otherwise(F.lit(0.0)), 6).alias("_qb"),
    )
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    ma, mb = F.col("_sa") / na, F.col("_sb") / nb
    va = (F.col("_qa") - F.col("_sa") * F.col("_sa") / na) / (na - F.lit(1.0))
    vb = (F.col("_qb") - F.col("_sb") * F.col("_sb") / nb) / (nb - F.lit(1.0))
    sea, seb = va / na, vb / nb
    t = (ma - mb) / F.sqrt(sea + seb)
    dof = (sea + seb) * (sea + seb) / (
        sea * sea / (na - F.lit(1.0)) + seb * seb / (nb - F.lit(1.0))
    )
    nrm = F.lit(float(value_norm))
    return row.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        stable_round(ma * nrm, round_to).alias("mean_a"),
        stable_round(mb * nrm, round_to).alias("mean_b"),
        stable_round(t, round_to).alias("t_stat"),
        stable_round(dof, round_to).alias("dof"),
    )


def concurrency_profile(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Peak concurrency per day via the sweep line: each user's
    active span within a day ([first event, last event], inclusive)
    contributes a +1 boundary at its start and a -1 at its end; the
    running sum of boundaries in time order is the number of
    simultaneously-active users, and its per-day max is the day's
    peak — capacity planning's standard question over any interval
    set. Ties resolve starts before ends (inclusive-overlap
    convention), then by user id, so the walk is deterministic.

    Scale shape: one shuffle reduces events to per-(user, day) spans;
    boundaries double that (map-side explode); the running sum is
    windowed PER DAY — partition-parallel across the calendar, never
    a global window. All integers, so every engine walks the same
    exact counts.
    """
    us = ts_us(F.col(ts_col))
    day_us = 86_400_000_000
    spans = (
        df.select(
            F.col(user_col).alias("_u"),
            us.alias("_us"),
            # integer epoch day (not a DATE column: int output columns
            # canonicalize identically in every engine/pandas path)
            F.floor(us / F.lit(float(day_us))).cast("long").alias("day"),
        )
        .groupBy("_u", "day")
        .agg(F.min("_us").alias("_s"), F.max("_us").alias("_e"))
    )
    bounds = spans.select(
        "day",
        "_u",
        F.explode(
            F.array(
                F.struct(F.col("_s").alias("_bus"), F.lit(1).alias("_d")),
                F.struct(F.col("_e").alias("_bus"), F.lit(-1).alias("_d")),
            )
        ).alias("b"),
    ).select("day", "_u", F.col("b._bus").alias("_bus"), F.col("b._d").alias("_d"))
    w = Window.partitionBy("day").orderBy(
        F.col("_bus").asc(), F.col("_d").desc(), F.col("_u").asc()
    )
    walked = bounds.withColumn(
        "_cur", F.sum("_d").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        walked.groupBy("day")
        .agg(
            F.max("_cur").cast("long").alias("peak_concurrent"),
            (F.count("*") / F.lit(2)).cast("long").alias("n_active_users"),
        )
        .orderBy("day")
    )


def sequence_pair_support(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 6,
) -> DataFrame:
    """Frequent length-2 behavioral patterns: for every ordered pair
    of event types (a → b, a ≠ b), the number and share of users
    whose stream contains SOME ``a`` strictly before SOME ``b`` —
    the support table sequential-pattern mining (PrefixSpan's first
    level) starts from, and the direct "do users who X later Y?"
    answer.

    The subsequence test needs no per-user scan of the raw stream:
    ``∃ t_a < t_b  ⇔  min_ts(a) < max_ts(b)``, so ONE user-keyed
    aggregation to per-(user, type) min/max timestamps (k types per
    user, k tiny) suffices; the pair test is a within-user self-join
    of that k-row-per-user table (co-partitioned on the user key, no
    second corpus shuffle of raw events). Exact integer
    microsecond comparisons; support share rounds at the end.
    """
    from ..functions.compare import stable_round

    us = ts_us(F.col(ts_col))
    per = (
        df.select(
            F.col(user_col).alias("_u"), us.alias("_us"), F.col(type_col).alias("_t")
        )
        .groupBy("_u", "_t")
        .agg(F.min("_us").alias("_mn"), F.max("_us").alias("_mx"))
    )
    n_users = per.select("_u").distinct().agg(
        F.count("*").alias("_nu")
    )
    a = per.select(
        F.col("_u"), F.col("_t").alias("type_a"), F.col("_mn").alias("_mna")
    )
    b = per.select(
        F.col("_u"), F.col("_t").alias("type_b"), F.col("_mx").alias("_mxb")
    )
    pairs = (
        a.join(b, "_u")
        .filter(
            (F.col("type_a") != F.col("type_b"))
            & (F.col("_mna") < F.col("_mxb"))
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
    return (
        pairs.crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_users",
            stable_round(
                F.col("n_users").cast("double") / F.col("_nu").cast("double"),
                round_to,
            ).alias("support"),
        )
        .orderBy(F.desc("n_users"), "type_a", "type_b")
    )


def twap(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    round_to: int = 4,
) -> DataFrame:
    """Time-weighted average of a step series per group: each
    observation holds its value until the group's next observation,
    so ``twap = Σ value_i·Δt_i / (t_last − t_first)`` — the metric
    finance (TWAP price), ops (time-in-state averages) and billing
    (usage metering) all need where the plain ``avg`` is wrong
    because samples arrive unevenly.

    One window pass per group (lead of the next timestamp), with Δt
    normalized to day fractions so the fixed-point element sums keep
    long headroom; the denominator span is an exact integer
    difference. Groups with a single observation (zero span) fall
    back to that observation's value. Ties on the timestamp order
    deterministically by a stable extra sort on the value.
    """
    from ..functions.compare import stable_round, stable_sum

    day_us = 86_400_000_000.0
    us = ts_us(F.col(ts_col))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_us").asc(), F.col("_v").asc()
    )
    stepped = df.select(
        *group_cols, us.alias("_us"), F.col(value_col).alias("_v")
    ).withColumn("_nxt", F.lead("_us").over(w))
    segs = stepped.withColumn(
        "_wfrac",
        (F.col("_nxt") - F.col("_us")).cast("double") / F.lit(day_us),
    )
    per = segs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_obs"),
        F.min("_us").alias("_t0"),
        F.max("_us").alias("_t1"),
        stable_sum(
            F.when(F.col("_nxt").isNotNull(), F.col("_v") * F.col("_wfrac"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("_area"),
        stable_sum(F.col("_v"), 6).alias("_sv"),
    )
    span = (F.col("_t1") - F.col("_t0")).cast("double") / F.lit(day_us)
    return per.select(
        *group_cols,
        "n_obs",
        stable_round(
            F.when(F.col("_t1") > F.col("_t0"), F.col("_area") / span).otherwise(
                F.col("_sv") / F.col("n_obs").cast("double")
            ),
            round_to,
        ).alias("twap"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    round_to: int = 4,
) -> DataFrame:
    """CUSUM change-point detection on each group's daily count
    series: the day ``k`` maximizing ``|Σ_{i≤k}(x_i − x̄)|`` is the
    most likely single change point (Page 1954 / binary-segmentation
    step) — the monitoring primitive that turns "did this stream's
    volume shift, and when?" into a query.

    EXACT arithmetic end to end: with integer daily counts,
    ``n·CUSUM_k = n·prefix_k − k·total`` stays in integers, so the
    argmax is engine-identical with no float tolerance anywhere
    (the personalized-pagerank fixed-point discipline applied to
    monitoring). Windows partition by group over the calendar-bounded
    day table. Returns ``(group, change_day, cusum, n_days)`` where
    ``cusum`` is the normalized maximum ``|CUSUM_k|``.
    """
    from ..functions.compare import stable_round

    us = ts_us(F.col(ts_col))
    day_us = 86_400_000_000
    daily = (
        df.select(
            F.col(group_col).alias("_g"),
            F.floor(us / F.lit(float(day_us))).cast("long").alias("_day"),
        )
        .groupBy("_g", "_day")
        .agg(F.count("*").alias("_x"))
    )
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("_g")
    scored = (
        daily.withColumn("_prefix", F.sum("_x").over(w_cum))
        .withColumn("_k", F.count("*").over(w_cum))
        .withColumn("_total", F.sum("_x").over(w_all))
        .withColumn("_n", F.count("*").over(w_all))
        # n·CUSUM_k: exact integers — no float enters the argmax
        .withColumn(
            "_ncusum",
            F.col("_n") * F.col("_prefix") - F.col("_k") * F.col("_total"),
        )
    )
    w_pick = Window.partitionBy("_g").orderBy(
        F.abs(F.col("_ncusum")).desc(), F.col("_day").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w_pick))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("_g").alias(group_col),
            F.col("_day").alias("change_day"),
            stable_round(
                F.abs(F.col("_ncusum")).cast("double")
                / F.col("_n").cast("double"),
                round_to,
            ).alias("cusum"),
            F.col("_n").cast("long").alias("n_days"),
        )
    )


def gini_coefficient(
    df: DataFrame,
    key_col: str,
    amount_cents: "F.Column",
    round_to: int = 6,
) -> DataFrame:
    """Gini concentration coefficient of an integer-cents amount over
    keys (customers, suppliers, documents): ``G = 2·Σ rank·x /
    (n·Σx) − (n+1)/n`` with ranks ascending by amount — the
    inequality summary the ABC/Pareto report (parts_abc_classes)
    implies but doesn't state as one number.

    Ranks come from the partition-offset pattern (range repartition
    on (amount, key), per-partition row_numbers + broadcast offsets —
    no global window); Σ rank·x is an exact integer aggregate.
    Headroom: Σ rank·x ≤ n·Σx — fine to ~10⁶ keys at cents scale; at
    larger corpora rescale the unit (Gini is scale-invariant) or
    compute from a quantile-binned Lorenz curve (k-bounded), both
    documented trade-offs of the exact form.
    """
    from ..functions.compare import stable_round

    per = (
        df.select(F.col(key_col).alias("_k"), amount_cents.alias("_c"))
        .groupBy("_k")
        .agg(F.sum("_c").alias("_x"))
        .localCheckpoint(eager=False)
    )
    ordered = (
        per.repartitionByRange(F.col("_x").asc(), F.col("_k").asc())
        .sortWithinPartitions(F.col("_x").asc(), F.col("_k").asc())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pcnt = ordered.groupBy("_pid").agg(F.count("*").alias("_pc"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = pcnt.select(
        "_pid", F.coalesce(F.sum("_pc").over(w_off), F.lit(0)).alias("_o")
    )
    w_local = Window.partitionBy("_pid").orderBy(
        F.col("_x").asc(), F.col("_k").asc()
    )
    ranked = ordered.join(F.broadcast(offs), "_pid").select(
        "_x", (F.row_number().over(w_local) + F.col("_o")).alias("_r")
    )
    g = ranked.agg(
        F.count("*").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum(F.col("_r") * F.col("_x")).alias("_srx"),
    )
    n = F.col("_n").cast("double")
    gini = (
        F.lit(2.0) * F.col("_srx").cast("double")
        / (n * F.col("_sx").cast("double"))
        - (n + F.lit(1.0)) / n
    )
    return g.select(
        F.col("_n").cast("long").alias("n_keys"),
        F.col("_sx").cast("long").alias("total_cents"),
        stable_round(gini, round_to).alias("gini"),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_cents: "F.Column",
    weight_col: str,
    quantiles: tuple[int, ...] = (25, 50, 75),
) -> DataFrame:
    """Exact weighted quantiles per group: the q-th weighted quantile
    is the smallest value whose running weight reaches ``q%`` of the
    group's total weight (type-1 / lower step of the weighted ECDF) —
    the right "median price" when rows carry quantities, token
    counts, or durations (the unweighted median over-counts small
    rows).

    All-integer decision rule — ``100·cum_w ≥ q·W`` — so the selected
    values are engine-identical with no float anywhere. One shuffle
    to per-(group, value) weights; the running weight is windowed per
    group over distinct values. Output: one row per group with a
    column per requested quantile (``p25, p50, ...``), values on the
    cents scale.
    """
    sel = df.select(
        F.col(group_col).alias("_g"),
        value_cents.alias("_v"),
        F.col(weight_col).alias("_w"),
    )
    # The (group, value) partial aggregation produces ~|distinct
    # pairs| groups — on a single-split scan that is one task
    # building a near-row-count hash table (r10, guide §2.5). The
    # guarded spread keys by exactly the groupBy columns at the
    # session partition count, so the aggregation REUSES the
    # exchange (guide §2.4) — distributed build, still one shuffle
    # total; no-op on any multi-split real-scale input.
    from cocoindex_data_ingestion_spark.functions.parallel import (
        spread_python_stage,
    )

    sel = spread_python_stage(sel, "_g", "_v")
    per = sel.groupBy("_g", "_v").agg(F.sum("_w").alias("_w"))
    w_cum = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("_g")
    cum = per.withColumn("_cw", F.sum("_w").over(w_cum)).withColumn(
        "_tw", F.sum("_w").over(w_all)
    )
    aggs = [F.max("_tw").cast("long").alias("total_weight")]
    for q in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.lit(100) * F.col("_cw") >= F.lit(q) * F.col("_tw"),
                    F.col("_v"),
                )
            )
            .cast("long")
            .alias(f"p{q}")
        )
    return cum.groupBy("_g").agg(*aggs).withColumnRenamed("_g", group_col)


def nearest_event_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_minutes: int = 60,
) -> DataFrame:
    """Nearest-neighbor temporal join: each left event pairs with the
    same key's single CLOSEST right event by |Δt| within a tolerance
    horizon — what diagnosis queries want ("the click nearest this
    error"), where :func:`asof_join` (backward-only) picks the wrong
    side whenever the cause follows the symptom. Ties (equal |Δt| on
    both sides) resolve to the EARLIER right event, then smaller id.

    Plan: the bounded horizon makes this a band join — the right side
    buckets into tolerance-sized time blocks, the left probes its
    block ±1 (co-partitioned on (key, block): 3 bounded probes per
    row, never a full per-key cross product — the events_range_pairs
    shape), and one min-struct aggregation per left row picks the
    nearest. Exact integer microsecond distances.

    Output: ``(key, id, ts_us, r_id, r_ts_us, dt_us)``.
    """
    tol_us = tolerance_minutes * 60 * 1_000_000
    l = left.select(
        F.col(key_col).alias("_k"),
        ts_us(F.col(ts_col)).alias("_lus"),
        F.col(id_col).alias("_lid"),
    )
    r = right.select(
        F.col(key_col).alias("_k"),
        ts_us(F.col(ts_col)).alias("_rus"),
        F.col(id_col).alias("_rid"),
    ).withColumn("_blk", F.floor(F.col("_rus") / F.lit(float(tol_us))).cast("long"))
    probes = l.withColumn(
        "_lblk", F.floor(F.col("_lus") / F.lit(float(tol_us))).cast("long")
    ).withColumn(
        "_blk",
        F.explode(
            F.array(F.col("_lblk") - 1, F.col("_lblk"), F.col("_lblk") + 1)
        ),
    )
    cand = (
        probes.join(r, ["_k", "_blk"])
        .withColumn("_dt", F.abs(F.col("_rus") - F.col("_lus")))
        .filter(F.col("_dt") <= F.lit(tol_us))
    )
    best = cand.groupBy("_k", "_lid", "_lus").agg(
        F.min(
            F.struct(F.col("_dt"), F.col("_rus"), F.col("_rid"))
        ).alias("_b")
    )
    return best.select(
        F.col("_k").alias(key_col),
        F.col("_lid").alias(id_col),
        F.col("_lus").alias("ts_us"),
        F.col("_b._rid").alias("r_" + id_col),
        F.col("_b._rus").alias("r_ts_us"),
        F.col("_b._dt").alias("dt_us"),
    )


def table_fingerprint(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Order-independent table checksum: the exact integer SUM of a
    32-bit md5 hash of every row's canonical serialization, plus the
    row count — the anti-entropy primitive replication/CDC pipelines
    compare across systems ("is the replica byte-identical?") without
    moving data. Any single-row difference shifts the sum.

    Canonical serialization: values cast to strings, NULL → the
    sentinel ``\\N``, joined with ``\\x1f`` — reproducible in any
    engine. ONE scan, one scalar aggregate, zero shuffles of data
    rows; Σ of 32-bit hashes stays inside int64 to 2³¹ rows per
    fingerprint (shard by key range past that and compare shard
    vectors).
    """
    sep, nul = chr(31), chr(92) + "N"
    ser = F.concat_ws(
        sep, *[F.coalesce(F.col(c).cast("string"), F.lit(nul)) for c in cols]
    )
    h = F.conv(F.substring(F.md5(ser), 1, 8), 16, 10).cast("long")
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(h).cast("long").alias("fingerprint"),
    )


def spearman_corr(
    df: DataFrame,
    col_x: str,
    col_y: str,
    round_to: int = 6,
) -> DataFrame:
    """Spearman rank correlation between two numeric columns —
    Pearson on AVERAGE ranks (full tie handling), the monotonic-
    association twin of lineitem_corr_matrix's Pearson (outlier-
    robust, captures nonlinear monotone relations).

    No global rank materialization: each column reduces to
    per-DISTINCT-VALUE counts; the running below-count uses the
    partition-offset pattern (the ks_test_2samp shape); the average
    rank ``below + (m+1)/2`` joins back to rows by value
    (co-partitioned). Ranks are normalized by n before the moment
    sums — Spearman is invariant under the rescale and it keeps the
    fixed-point elements O(1) (the corr-matrix overflow discipline).
    Half-integer ranks are exact in doubles, so both engines see
    identical coordinates.
    """
    from ..functions.compare import stable_round

    # Joint distribution FIRST (r10): one map-side-combinable groupBy
    # reduces the row stream to distinct (x, y) pairs with counts, and
    # everything downstream — both per-column marginals AND the rank
    # joins — runs over pairs, never rows. The moment sums stay
    # bit-identical because stable_sum quantizes each element BEFORE
    # summing: every row of a pair contributes the identical long, so
    # count*quantized == the row-level sum exactly.
    sel = df.select(col_x, col_y)
    # guarded spread keyed by exactly the groupBy columns: the pair
    # build's partial aggregation (near-|distinct pairs| hash table)
    # distributes instead of running on a one-split scan's single
    # task, and the aggregation reuses the exchange (r10, guide
    # §2.4/§2.5; no-op on multi-split inputs).
    from ..functions.parallel import spread_python_stage

    sel = spread_python_stage(sel, col_x, col_y)
    pairs = (
        sel.groupBy(col_x, col_y)
        .agg(F.count("*").alias("_c"))
        .localCheckpoint(eager=False)
    )

    def avg_ranks(col: str, out: str) -> DataFrame:
        per = (
            pairs.select(F.col(col).alias("_v"), "_c")
            .groupBy("_v")
            .agg(F.sum("_c").alias("_m"))
            .localCheckpoint(eager=False)
        )
        ordered = (
            per.repartitionByRange(F.col("_v"))
            .sortWithinPartitions("_v")
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=False)
        )
        ptot = ordered.groupBy("_pid").agg(F.sum("_m").alias("_pm"))
        w_off = Window.orderBy("_pid").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = ptot.select(
            "_pid",
            F.coalesce(F.sum("_pm").over(w_off), F.lit(0)).alias("_o"),
        )
        w_local = Window.partitionBy("_pid").orderBy("_v")
        return (
            ordered.join(F.broadcast(offs), "_pid")
            .select(
                "_v",
                (
                    (
                        F.sum("_m").over(
                            w_local.rowsBetween(Window.unboundedPreceding, 0)
                        )
                        + F.col("_o")
                        - F.col("_m")
                    ).cast("double")
                    + (F.col("_m").cast("double") + F.lit(1.0)) / F.lit(2.0)
                ).alias(out),
            )
            .withColumnRenamed("_v", col)
        )

    n_df = df.agg(F.count("*").alias("_n"))
    joined = (
        pairs
        .join(avg_ranks(col_x, "_rx"), col_x)
        .join(avg_ranks(col_y, "_ry"), col_y)
        .crossJoin(F.broadcast(n_df))
        .select(
            "_c",
            (F.col("_rx") / F.col("_n").cast("double")).alias("x"),
            (F.col("_ry") / F.col("_n").cast("double")).alias("y"),
        )
    )

    # count-weighted stable_sum: quantize the pair's element once,
    # multiply by its multiplicity in exact long arithmetic — equal
    # term-by-term to the row-level stable_sum it replaces
    def wsum(col: Column, n: int = 7) -> Column:
        p = float(10**n)
        q = F.floor(col * F.lit(p) + F.lit(0.5)).cast("long")
        return F.sum(F.col("_c") * q) / F.lit(p)

    g = joined.agg(
        F.sum("_c").cast("double").alias("n"),
        wsum(F.col("x")).alias("sx"),
        wsum(F.col("y")).alias("sy"),
        wsum(F.col("x") * F.col("y")).alias("sxy"),
        wsum(F.col("x") * F.col("x")).alias("sxx"),
        wsum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
    dy = F.sqrt(n * F.col("syy") - F.col("sy") * F.col("sy"))
    return g.select(
        n.cast("long").alias("n"),
        stable_round(num / (dx * dy), round_to).alias("spearman"),
    )


def grouped_ewma(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Exponentially-weighted moving average (α = 1/2) of each
    group's DAILY COUNT series — the classic smoother behind
    monitoring baselines, computed with Spark's Arrow-batched
    ``applyInPandas`` because the recurrence ``s_t = (x_t + s_{t-1})/2``
    is inherently sequential WITHIN a group (no window/aggregate
    expresses it); groups still parallelize across the cluster, which
    is the correct distribution axis for per-series state.

    α = 1/2 makes every step a binary-exact halving, so the recurrence
    produces IDENTICAL doubles in any engine that walks the series in
    day order — a DuckDB recursive CTE oracles the whole pipeline
    (the applyInPandas path is otherwise rows-only territory).
    """
    import pandas as pd

    from ..functions.compare import stable_round

    us = ts_us(F.col(ts_col))
    day_us = 86_400_000_000
    daily = (
        df.select(
            F.col(group_col).alias("g"),
            F.floor(us / F.lit(float(day_us))).cast("long").alias("day"),
        )
        .groupBy("g", "day")
        .agg(F.count("*").cast("long").alias("n"))
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out, cur = [], None
        for x in pdf["n"].astype("float64"):
            cur = x if cur is None else (x + cur) / 2.0
            out.append(cur)
        pdf["ewma"] = out
        return pdf

    smoothed = daily.groupBy("g").applyInPandas(
        walk, schema="g string, day long, n long, ewma double"
    )
    return smoothed.select(
        F.col("g").alias(group_col),
        "day",
        "n",
        stable_round(F.col("ewma"), round_to).alias("ewma"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: "F.Column",
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion z-test (pooled): compares success rates between
    two cohorts — THE conversion-rate A/B primitive, completing the
    test family (chi2: independence, Welch: means, KS: distributions,
    this: proportions). ``z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a+1/n_b))``
    with the pooled estimate; the normal p-value is left to the
    caller's lookup (erf differs across libms; z itself is exact
    arithmetic over integer counts).

    ONE conditional-aggregate scan — four integers out; every derived
    double is the same IEEE expression in any engine.
    """
    from ..functions.compare import stable_round

    ia = F.when(F.col(group_col) == group_a, 1).otherwise(0)
    ib = F.when(F.col(group_col) == group_b, 1).otherwise(0)
    s = F.when(success_col, 1).otherwise(0)
    row = df.filter(F.col(group_col).isin([group_a, group_b])).agg(
        F.sum(ia).alias("_na"),
        F.sum(ib).alias("_nb"),
        F.sum(ia * s).alias("_sa"),
        F.sum(ib * s).alias("_sb"),
    )
    na, nb = F.col("_na").cast("double"), F.col("_nb").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    pa, pb = sa / na, sb / nb
    pool = (sa + sb) / (na + nb)
    var = pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    # degenerate cohorts (all successes or all failures pooled) have
    # zero variance: report NULL rather than divide by zero
    z = F.when(var > 0, (pa - pb) / F.sqrt(var))
    return row.select(
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        F.col("_sa").cast("long").alias("successes_a"),
        F.col("_sb").cast("long").alias("successes_b"),
        stable_round(pa, round_to).alias("rate_a"),
        stable_round(pb, round_to).alias("rate_b"),
        stable_round(z, round_to).alias("z_stat"),
    )


def acf_daily(
    df: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Autocorrelation function of the stream's daily event-count
    series at lags 1..``max_lag`` — the periodicity detector (a
    weekly cycle spikes lag 7) that tells a pipeline whether
    seasonal_profile's decomposition is even warranted, and the
    standard pre-check before any forecasting.

    Each lag's correlation is computed over the overlapping day
    pairs with the closed-form five-moment Pearson (the corr-matrix
    discipline): the daily table is CALENDAR-BOUNDED, lags explode
    map-side (``max_lag`` literals), and one self-join on
    ``day + lag`` aligns the pairs — integer counts end-to-end until
    the final ratio.
    """
    from ..functions.compare import stable_round, stable_sum

    us = ts_us(F.col(ts_col))
    day_us = 86_400_000_000
    daily = (
        df.select(
            F.floor(us / F.lit(float(day_us))).cast("long").alias("day")
        )
        .groupBy("day")
        .agg(F.count("*").alias("x"))
        .localCheckpoint(eager=False)
    )
    lags = daily.select(
        "day",
        "x",
        F.explode(
            F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
        ).alias("lag"),
    )
    paired = lags.join(
        daily.select(F.col("day").alias("_d2"), F.col("x").alias("y")),
        F.col("day") + F.col("lag") == F.col("_d2"),
    )
    xd = F.col("x").cast("double")
    yd = F.col("y").cast("double")
    g = paired.groupBy("lag").agg(
        F.count("*").cast("double").alias("n"),
        stable_sum(xd, 4).alias("sx"),
        stable_sum(yd, 4).alias("sy"),
        stable_sum(xd * yd, 4).alias("sxy"),
        stable_sum(xd * xd, 4).alias("sxx"),
        stable_sum(yd * yd, 4).alias("syy"),
    )
    n = F.col("n")
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return g.select(
        F.col("lag").cast("long").alias("lag"),
        n.cast("long").alias("n_pairs"),
        stable_round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), round_to).alias(
            "acf"
        ),
    ).orderBy("lag")


def trend_backtest(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    min_history: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Walk-forward backtest of the OLS trend forecaster: for every
    day t with ≥ ``min_history`` prior days, fit the linear trend on
    days < t from EXPANDING-WINDOW moment sums and score the one-step
    prediction against the actual count — how forecasting is actually
    validated (no leakage: each prediction sees only its past).
    Returns per group ``(n_preds, mae, bias)``.

    No per-day refits: the five OLS moments are cumulative integer
    sums over the calendar-bounded daily table (one window pass per
    group), so the whole backtest is ONE plan — the closed-form
    regression discipline made incremental. Day indexes are
    group-relative ranks (intercept stays small); integer moments
    are exact, and each prediction is the same IEEE expression in
    any engine.
    """
    from ..functions.compare import stable_round, stable_sum

    us = ts_us(F.col(ts_col))
    day_us = 86_400_000_000
    daily = (
        df.select(
            F.col(group_col).alias("_g"),
            F.floor(us / F.lit(float(day_us))).cast("long").alias("_day"),
        )
        .groupBy("_g", "_day")
        .agg(F.count("*").alias("_y"))
    )
    w_ord = Window.partitionBy("_g").orderBy("_day")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    idx = daily.withColumn("_x", F.row_number().over(w_ord).cast("long"))
    cum = (
        idx.withColumn("_n", F.count("*").over(w_prev))
        .withColumn("_sx", F.sum("_x").over(w_prev))
        .withColumn("_sy", F.sum("_y").over(w_prev))
        .withColumn("_sxy", F.sum(F.col("_x") * F.col("_y")).over(w_prev))
        .withColumn("_sxx", F.sum(F.col("_x") * F.col("_x")).over(w_prev))
        .filter(F.col("_n") >= min_history)
    )
    n = F.col("_n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxy, sxx = F.col("_sxy").cast("double"), F.col("_sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    pred = intercept + slope * F.col("_x").cast("double")
    err = F.col("_y").cast("double") - pred
    scored = cum.select("_g", err.alias("_e"))
    return (
        scored.groupBy("_g")
        .agg(
            F.count("*").cast("long").alias("n_preds"),
            stable_round(
                stable_sum(F.abs(F.col("_e")), 6)
                / F.count("*").cast("double"),
                round_to,
            ).alias("mae"),
            stable_round(
                stable_sum(F.col("_e"), 6) / F.count("*").cast("double"),
                round_to,
            ).alias("bias"),
        )
        .withColumnRenamed("_g", group_col)
        .orderBy(group_col)
    )
