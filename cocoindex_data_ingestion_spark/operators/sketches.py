"""Mergeable sketch rollups: the pre-aggregated path for distinct
counts and quantiles at 100 TB.

The reference computes corpus statistics by full recount
(app/services/search_service.py stats, neo4j get_statistics); at
scale the standard design is a **sketch table**: one
Apache-DataSketches HLL per (dimension, day) materialized once, and
every ad-hoc range/rollup query answered by UNIONING sketches —
O(cells read), never O(events), with the sketch union exact w.r.t.
the per-cell sketches (HLL union loses no additional accuracy).

Spark 4 ships the DataSketches family as native expressions
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the whole path is JVM-side codegen — no UDFs. DuckDB has no
binary-compatible sketch, so registry exposure is rows-only; the
accuracy contract (relative error vs exact distinct within the HLL
lgK bound) is pinned in tests instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_table(
    df: DataFrame,
    cell_cols: list[str],
    distinct_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Materialize one HLL sketch per cell — the table a deployment
    writes incrementally (sketches of new partitions union into
    place; no read-modify-write of raw data)."""
    return df.groupBy(*[F.col(c) for c in cell_cols]).agg(
        F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def rollup_estimate(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Approx distinct over any rollup of the cell grid by unioning
    cell sketches (group_cols=None → grand total)."""
    est: Column = F.hll_sketch_estimate(
        F.hll_union_agg(F.col(sketch_col))
    ).alias("approx_distinct")
    n = F.sum("n_rows").alias("n_rows")
    if group_cols:
        return sketches.groupBy(*[F.col(c) for c in group_cols]).agg(est, n)
    return sketches.agg(est, n)


# -- mergeable fixed-bin histogram quantiles ----------------------------------

def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    n_bins: int = 32,
    lo: Column | float | None = None,
    hi: Column | float | None = None,
) -> DataFrame:
    """Per-group fixed-bin histogram — the mergeable quantile sketch:
    ``(group..., bin, c)`` where ``bin = clamp(floor((v-lo)/(hi-lo)
    * B))``. Merging groups = summing bin counts (exact), so rollups
    across any dimension cost O(cells), never O(rows) — the same
    pre-aggregation discipline as the HLL sketch table above, for
    quantiles. ``lo``/``hi`` default to the global min/max folded in
    as broadcast scalars (one extra scalar-agg pass)."""
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        rng = df.agg(
            F.min(v).alias("_lo"), F.max(v).alias("_hi")
        )
        df = df.crossJoin(F.broadcast(rng))
        lo_c, hi_c = F.col("_lo"), F.col("_hi")
    else:
        lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
        hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
        df = df.withColumn("_lo", lo_c).withColumn("_hi", hi_c)
    b = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((v - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))
                    * F.lit(float(n_bins))).cast("int"),
        ),
    )
    return (
        df.withColumn("bin", b)
        .groupBy(*group_cols, "bin", "_lo", "_hi")
        .agg(F.count("*").alias("c"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    n_bins: int = 32,
) -> DataFrame:
    """Quantile estimates from a (possibly merged) histogram sketch:
    for each q, the LOWER EDGE of the first bin whose cumulative count
    reaches ``ceil(q * n)`` — a deterministic, engine-exact rule
    (integer ranks, one multiply per edge). Cumulation is a window
    over at most ``n_bins`` rows per group."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    n = F.sum("c")
    aggs = [n.cast("long").alias("n")]
    for q in qs:
        target = F.ceil(F.lit(q) * F.sum("c").over(
            Window.partitionBy(*group_cols)
        ))
        cum = cum.withColumn(f"_t_{int(q*100)}", target)
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.col(f"_t_{int(q*100)}"), F.col("bin")
                )
            ).alias(f"_k_{int(q*100)}")
        )
    out = cum.groupBy(*group_cols, "_lo", "_hi").agg(*aggs)
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    sel = [*group_cols, F.col("n")]
    for q in qs:
        sel.append(
            (F.col("_lo") + F.col(f"_k_{int(q*100)}") * width)
            .alias(f"p{int(q*100)}_est")
        )
    return out.select(*sel)


# -- count-min sketch ---------------------------------------------------------

def cms_table(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-min sketch of ``key_col`` frequencies: ``depth`` hash
    rows x ``width`` buckets of exact counts — a fixed
    ``depth*width``-row mergeable summary (merge = cell-wise sum,
    like the histogram sketch) answering point frequency queries with
    one-sided error: estimate >= true count, overshoot bounded by
    collisions (~2N/width w.p. 1-2^-depth). Hashing is md5-derived,
    so both engines agree bit-for-bit."""
    pairs = [
        F.struct(
            F.lit(j).alias("j"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("#", F.lit(str(j)), F.col(key_col))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long") % width
            ).alias("bucket"),
        )
        for j in range(depth)
    ]
    return (
        df.select(F.explode(F.array(*pairs)).alias("p"))
        .select("p.j", "p.bucket")
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point frequency estimates: for each key, min over the depth
    rows of its bucket's count. The sketch is broadcast (bounded at
    depth*width rows); keys never shuffle."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            "#", F.lit(str(j)),
                                            F.col(key_col),
                                        )
                                    ),
                                    1, 8,
                                ),
                                16, 10,
                            ).cast("long") % width
                        ).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.j", "p.bucket")
    return (
        probes.join(F.broadcast(cms), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long")
            .alias("cms_est")
        )
    )


# -- deterministic cross-engine HLL (xxhash64 registers) ------------------------
#
# The DataSketches path above is the production default but its
# binary format is engine-specific, which kept the sketch queries
# rows-only. This variant is a textbook HLL whose EVERY step is
# deterministic integer arithmetic on Spark's xxhash64 — so the
# DuckDB oracle replays it exactly (functions/xxhash_sql.py provides
# the hash twin): register = leading-zero rank of the hash suffix,
# cell state = max per (cell, bucket) — mergeable by relational MAX,
# so rollups stay O(cells) at 100 TB and incremental writes are
# idempotent. Same design as Flajolet et al.'s HLL with the standard
# small-range correction; alpha and the raw-estimate numerator are
# Python-float literals embedded verbatim in both engines.

DET_HLL_P = 12                      # 4096 buckets, ~1.6% rel. error
DET_HLL_M = 1 << DET_HLL_P
_SUFFIX = 64 - DET_HLL_P            # rank bits
DET_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / DET_HLL_M)
# raw-estimate numerator alpha·m²·2^64 / 4 (the 4 un-scales the
# exact Σ 2^(62−M) register sum, which is kept ≤ 2^62 per term so the
# Spark side sums exactly in decimal(38,0))
DET_HLL_NUM = DET_HLL_ALPHA * DET_HLL_M * DET_HLL_M * (2.0 ** 64) / 4.0


def det_hll_cells(
    df: DataFrame, cell_cols: list[str], distinct_col: str
) -> DataFrame:
    """(cell..., bucket, m_reg) deterministic-HLL register table.

    The value is forced to LONG so Spark's xxhash64 takes the
    hashLong path (the oracle twin mirrors exactly that)."""
    h = F.xxhash64(F.col(distinct_col).cast("long"))
    bucket = F.shiftrightunsigned(h, _SUFFIX)
    w = h.bitwiseAND(F.lit((1 << _SUFFIX) - 1))
    rho = F.when(w == F.lit(0), F.lit(_SUFFIX + 1)).otherwise(
        F.lit(_SUFFIX + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            *[F.col(c) for c in cell_cols],
            bucket.alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*cell_cols, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )


def det_hll_estimate(
    cells: DataFrame, group_cols: list[str],
    out_col: str = "approx_distinct", round_to: int = 4,
) -> DataFrame:
    """Roll register cells up to ``group_cols`` (merge = MAX) and
    estimate: exact-integer register sum, one double division, the
    standard small-range linear-counting branch. Engine-exact up to
    the documented ln() 1-ulp exposure (same acceptance as the NB
    classifier's fixed-point log-priors)."""
    from ..functions.compare import stable_round

    m = DET_HLL_M
    merged = (
        cells.groupBy(*group_cols, "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    # shiftleft's bit-count arg must be a Column-free int in the
    # classic API — route through expr for the per-row shift
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 62 - m_reg)").cast(
        "decimal(38,0)"
    )
    agg = merged.groupBy(*group_cols).agg(
        F.sum(term).alias("_s62"), F.count("*").alias("_nb")
    )
    s_total = F.col("_s62") + (
        (F.lit(m) - F.col("_nb")).cast("decimal(38,0)")
        * F.lit(1 << 62).cast("decimal(38,0)")
    )
    e_raw = F.lit(DET_HLL_NUM) / s_total.cast("double")
    zeros = (F.lit(m) - F.col("_nb")).cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("_nb") < F.lit(m)),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, stable_round(est, round_to).alias(out_col)
    )


# -- deterministic mergeable quantile sketch (log2/16 histogram) ---------------
#
# The quantile analogue of the deterministic HLL above: DDSketch-style
# relative-error quantiles (Masson, Rim & Lee, "DDSketch: a fast and
# fully-mergeable quantile sketch with relative-error guarantees",
# VLDB 2019) with the log-gamma bucket map replaced by a PURE INTEGER
# one so both engines compute identical cells with no float exposure
# at all: a positive BIGINT value maps to its bit-length plus its 4
# bits after the MSB (16 sub-buckets per octave -> relative
# half-width <= 1/32 ~ 3.1%), values < 32 map to themselves exactly.
# Cell state is (cell..., bucket, cnt) — mergeable by relational SUM,
# so incremental ingest appends cells and rollups stay O(cells) at
# 100 TB, exactly like the HLL register table. Quantile estimation is
# an integer cumulative-count walk; the only doubles are the q*n rank
# products, and the oracle twins CAST their q literals to DOUBLE so
# the multiply is the same IEEE operation in both engines structurally
# (DuckDB would otherwise parse a bare 0.95 as DECIMAL and compute
# the rank exactly — coincident for these quantiles, but a different
# operation).

QSK_SMALL = 32  # values below this are their own (exact) bucket


def _qsk_bucket_expr(v: str) -> str:
    """SQL bucket map, valid verbatim in Spark SQL and DuckDB:
    bit_length*16 + top-4-bits-after-MSB, identity below QSK_SMALL.
    (bin() is minimal-length in both engines; >> and & are portable
    on BIGINT.)"""
    return (
        f"CASE WHEN {v} < {QSK_SMALL} THEN {v} "
        f"ELSE length(bin({v})) * 16 "
        f"+ ((({v} >> (length(bin({v})) - 5))) & 15) END"
    )


def _qsk_rep_expr(b: str) -> str:
    """SQL inverse map: the representative (midpoint) value of bucket
    ``b`` — exact identity below QSK_SMALL, else lo + half where
    lo = (16 + b%16) << (b//16 - 5) and half = 1 << (b//16 - 6).
    The octave division goes through floor() BEFORE the BIGINT cast:
    a raw CAST(double AS BIGINT) truncates in Spark but rounds
    half-even in DuckDB (diverges at b=105); floor of the in-range
    double is exact and portable, and casting an integral double is
    then exact in both engines."""
    oct_ = f"CAST(floor({b} / 16.0) AS BIGINT)"  # b >= 96 in ELSE arm
    return (
        f"CASE WHEN {b} < {QSK_SMALL} THEN {b} "
        f"ELSE ((16 + ({b} % 16)) << ({oct_} - 5)) "
        f"+ (CAST(1 AS BIGINT) << ({oct_} - 6)) END"
    )


def qsketch_cells(
    df: DataFrame, cell_cols: list[str], value_col: str
) -> DataFrame:
    """(cell..., bucket, cnt) quantile-sketch cell table over a
    NON-NEGATIVE BIGINT value column (quantize exactly before calling
    — e.g. decimal cents via CAST(floor(price*100 + 0.5) AS BIGINT)).
    One map-side-combinable exchange; cells merge downstream by
    SUM(cnt).

    The value contract is ENFORCED, not assumed (r9 advisor): NULLs
    are dropped (SQL-aggregate semantics — and Spark windows sort
    NULL buckets first while DuckDB sorts them last, so a NULL
    slipping into the cells would silently diverge from any oracle
    twin), and a negative value raises (``bin()`` of a negative
    BIGINT is its 64-bit two's complement — the bucket map would be
    garbage). 0..QSK_SMALL-1 are their own exact buckets, so 0 is
    fine."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *[F.col(c) for c in cell_cols],
            F.coalesce(
                # assert_true yields NULL when the predicate holds and
                # raises otherwise, so the coalesce is an in-plan guard
                # with one comparison per row and no extra action
                F.assert_true(
                    F.col(value_col) >= 0,
                    F.lit(
                        "qsketch_cells: value_col must be a"
                        " non-negative BIGINT (quantize upstream)"
                    ),
                ).cast("bigint"),
                F.expr(_qsk_bucket_expr(value_col)),
            ).alias("bucket"),
        )
        .groupBy(*cell_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def qsketch_quantiles(
    cells: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Merge cells up to ``group_cols`` (SUM) and estimate each
    quantile in ``qs``: rank k = max(1, ceil(q*n)) (the q*n double
    product is the same IEEE operation in both engines), answer = the
    representative of the first bucket whose cumulative count reaches
    k. Output columns: group..., n, p<q> (BIGINT representatives in
    the value's quantized unit). State per group is the bucket list
    (<= ~16 per octave of value range — hundreds, never rows)."""
    from pyspark.sql import Window

    merged = (
        cells.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = merged.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    rep = F.expr(_qsk_rep_expr("bucket"))
    aggs = [F.max("n").alias("n")]
    for q in qs:
        k = F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.lit(q) * F.col("n").cast("double")).cast("long"),
        )
        aggs.append(
            F.min(F.when(F.col("cum") >= k, rep)).alias(
                f"p{int(round(q * 100))}"
            )
        )
    return cum.groupBy(*group_cols).agg(*aggs)
