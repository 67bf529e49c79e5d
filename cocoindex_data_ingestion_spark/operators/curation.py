"""Training-data curation operators: deterministic sampling, dataset
mixing, sequence packing, benchmark decontamination, and duplicate
resolution.

These are the corpus-construction steps a pretraining pipeline runs
between ingestion/dedup and tokenization. The reference stops at
indexing (its flows end at vector/graph export —
``app/flows/document_processing_flow.py``); this module supplies the
downstream curation surface a 100 TB corpus needs, built from the same
document tables.

Design rules (all oracle-checkable and cluster-size-invariant):

- **No randomness.** Every "random" choice is an md5 rank over a
  salted key, so results are byte-identical across runs, partition
  counts, and engines (Spark and DuckDB md5 agree on identical input
  strings).
- **Filters before shuffles.** ``weighted_mix`` is a pure per-row
  filter (zero shuffles); ``stratified_sample`` shuffles once on the
  stratum key; ``pack_sequences`` shuffles once on the packing
  partition key. Nothing materializes all-pairs state.
- **Small side broadcast.** Decontamination joins the corpus against
  the benchmark n-gram set, which is tiny by construction — the
  plan broadcasts it so the 100 TB side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize

# 8 hex digits of the md5 = 32 uniform bits: enough resolution for
# sampling fractions down to ~2e-10 while staying lexicographically
# comparable as a string in both engines.
_HASH_HEX_DIGITS = 8


def hash_rank(key: Column | str, salt: str = "cur") -> Column:
    """Deterministic uniform rank in hex-string space.

    ``md5(salt # key)`` truncated to 8 hex chars. Lowercase-hex
    strings compare lexicographically exactly like the integers they
    encode, so ``hash_rank(k) < fraction_threshold(f)`` keeps an
    ``f``-fraction of rows — a pure filter, no shuffle, stable under
    repartitioning.
    """
    k = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat_ws("#", F.lit(salt), k.cast("string"))), 1, _HASH_HEX_DIGITS)


def fraction_threshold(fraction: float) -> str:
    """Hex threshold t such that P[hash_rank < t] == fraction.

    fraction=1.0 returns ``"g"`` — lexicographically above every hex
    string (a 9-digit ``100000000`` would compare by first char and
    sort BELOW ``"2..."``), so keep-everything stays a true filter.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (16 ** _HASH_HEX_DIGITS)), f"0{_HASH_HEX_DIGITS}x")


def hash_rank_sql(key: str, salt: str = "cur") -> str:
    """DuckDB twin of :func:`hash_rank` (identical md5 input string)."""
    return f"substr(md5('{salt}' || '#' || ({key})::VARCHAR), 1, {_HASH_HEX_DIGITS})"


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """Keep a deterministic ``per_stratum``-cap sample from every
    stratum (e.g. per-language caps to rebalance a corpus).

    Ranks rows inside each stratum by md5 of the key (uniform, so the
    kept set is an unbiased size-capped sample) and keeps rank <=
    cap. One shuffle on the strata columns. Skewed strata cost only a
    per-partition sort, not memory: row_number is a streaming window.
    At 100 TB with billion-row strata, swap the exact rank for a
    threshold precomputed from the stratum count (still one scan +
    one tiny agg) — semantics identical, no sort.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_rank(key_col, salt), F.col(key_col)
    )
    return (
        df.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= per_stratum)
    )


def weighted_mix(
    df: DataFrame,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each source to its mixing weight (the dataset-mix
    step of corpus assembly: keep 100% of wiki, 10% of crawl, ...).

    Implemented as ``hash_rank(key) < threshold(weight[source])`` — a
    pure per-row filter with **zero shuffles**; the thresholds inline
    as a literal CASE chain so Catalyst pushes the whole predicate to
    the scan. Deterministic: re-running on a grown corpus keeps every
    previously-kept row (reservoir property of hash sampling).
    """
    src = F.col(source_col)
    thr: Column = F.lit(fraction_threshold(default_weight))
    for s, wgt in sorted(weights.items()):
        thr = F.when(src == s, F.lit(fraction_threshold(wgt))).otherwise(thr)
    return df.filter(hash_rank(key_col, salt) < thr)


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_col: str,
    budget: int,
    part_cols: list[str] | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training bins.

    Documents are laid out in deterministic ``order_col`` order (per
    ``part_cols`` partition) and cut into bins where the running token
    total crosses the budget: ``bin = floor((cumsum - tokens) /
    budget)`` — i.e. a document starts a new bin when the previous
    ones filled it. One shuffle on the partition columns; the window
    cumsum is a streaming frame (no buffering). Per-partition packing
    is exactly how a distributed tokenizer shards: each partition
    packs independently, so 1000 executors pack 1000 streams with no
    coordination.
    """
    part_cols = part_cols or []
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tok = F.col(token_col).cast("long")
    cum = F.sum(tok).over(w)
    return df.withColumn("bin_id", F.floor((cum - tok) / F.lit(budget)))


def word_ngrams(col: Column | str, n: int) -> Column:
    """Distinct word ``n``-grams (space-joined token windows).

    Uses the unfiltered tokenizer — contamination checks must not
    drop stopwords, or 'to be or not to be' never matches. Documents
    shorter than ``n`` tokens yield no n-grams (can't witness an
    n-gram overlap).
    """
    toks = tokenize(col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(col: str, n: int) -> str:
    """DuckDB twin of :func:`word_ngrams`."""
    toks = f"regexp_extract_all(lower({col}), '[a-z0-9]+')"
    return f"""
CASE WHEN len({toks}) >= {n}
     THEN list_distinct(list_transform(
            generate_series(1, len({toks}) - {n - 1}),
            i -> array_to_string(({toks})[i:i + {n - 1}], ' ')))
     ELSE [] END
"""


def _bench_gram_hashes(benchmark: DataFrame, text_col: str, n: int) -> DataFrame:
    return (
        benchmark.select(F.explode(word_ngrams(text_col, n)).alias("gram"))
        .distinct()
        .select(F.md5("gram").alias("gram_h"))
    )


def _train_gram_hashes(
    train: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram_h) stream for the 100 TB training side — shared by
    :func:`decontaminate` and :func:`decontaminate_bloom`.

    Uses posexplode + lead-window n-gram construction instead of the
    array-lambda form: Spark's higher-order transform/slice runs in
    the interpreted evaluator (measured ~5-10x slower at 250k grams),
    while lead() windows and concat_ws stay in whole-stage codegen.
    Same strings, so the same distinct-gram multiset as
    :func:`word_ngrams` (equivalence asserted in tests) and the
    DuckDB twin.

    (Repartitioning the DOC rows by id before exploding — to
    pre-satisfy the window's distribution with a ~500x smaller
    exchange — was measured a net loss here: AQE coalesces the
    byte-tiny doc exchange to few partitions and the explode then
    runs with no parallelism. The token-level exchange is the right
    trade while docs-per-core is low; at true corpus scale flip to
    the doc-level repartition with AQE coalescing capped.)"""
    w = Window.partitionBy(id_col).orderBy("pos")
    toks = train.select(
        F.col(id_col), F.posexplode(tokenize(text_col)).alias("pos", "token")
    )
    parts = [F.col("token")] + [F.lead("token", i).over(w) for i in range(1, n)]
    return (
        toks.withColumn("gram", F.concat_ws(" ", *parts))
        .withColumn("_last", parts[-1])
        .filter(F.col("_last").isNotNull())
        .select(id_col, F.md5("gram").alias("gram_h"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with a
    benchmark/eval set (the standard pretraining decontamination
    test, e.g. GPT-3 appendix C / PaLM 13-gram overlap).

    Returns ``(id_col, n_hits)`` for contaminated training docs —
    the caller anti-joins to drop them. The benchmark n-gram set is
    deduplicated and **broadcast** (eval suites are ~1e5 n-grams;
    the training side is the 100 TB one), so the big side is a single
    scan + explode with no shuffle; the final per-doc count shuffles
    only the matched (tiny) subset.
    """
    bench_grams = _bench_gram_hashes(benchmark, text_col, n)
    train_grams = _train_gram_hashes(train, id_col, text_col, n)
    # distinct AFTER the broadcast join: the join is shuffle-free and
    # filters the 100 TB gram stream down to the matched (tiny)
    # subset, so deduplicating (id, gram) there costs a shuffle of
    # matches only — not of every training n-gram. Same n_hits
    # (count of DISTINCT shared grams per doc).
    return (
        train_grams.join(F.broadcast(bench_grams), "gram_h")
        .select(id_col, "gram_h")
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def decontaminate_bloom(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """:func:`decontaminate` behind a deterministic Bloom pre-filter
    — SAME answer (the Bloom has no false negatives and its false
    positives are removed by an exact verify join), different plan
    for the regime :func:`decontaminate` cannot reach: an eval gram
    set too large to broadcast as md5 strings. A combined benchmark
    suite at 1e8-1e9 distinct n-grams is ~3-30 GB of hashes — far
    over any broadcast threshold, forcing the plain recipe to
    SHUFFLE the full 100 TB training gram stream into a sort-merge
    join. The Bloom version broadcasts an ``m_bits``-bit bitset
    (2^30 bits = 128 MB covers 1e8 grams at k=4 with ~2% FP) and
    drops non-matching grams MAP-SIDE; only survivors — true matches
    plus the FP-rate sliver — reach the exact verify join, whose
    shuffle volume is |matches| + fp_rate * |grams|, not |grams|.

    Construction is pure Column arithmetic, no UDFs: positions are
    ``pmod(xxhash64(gram_h, seed_i), m_bits)``, the bitset is a
    (word, bits) table built with ``bit_or(shiftleft(1, pos % 64))``
    — m_bits/64 rows (16 KB of longs per 2^20 bits), broadcast-
    joined against the train side's k exploded positions; a gram
    passes iff all k probes find their bit set. The verify join is
    deliberately left UNHINTED: AQE broadcasts the (small) true
    bench set at fixture scale and falls back to shuffle at
    too-big-to-broadcast scale — the boilerplate_strip precedent.

    The k-way position explode amplifies the map-side gram stream
    k-fold BEFORE any exchange — narrow rows through a broadcast
    hash probe, the classic bandwidth-for-shuffle trade.
    """
    bench_grams = _bench_gram_hashes(benchmark, text_col, n)

    def positions(col: Column) -> list[Column]:
        # k independent probes from one 64-bit hash family:
        # xxhash64(gram_h, seed_i) — seed folded in as a column so
        # every probe is a distinct deterministic function
        return [
            F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]

    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))")
    bitset = (
        bench_grams.select(
            F.explode(F.array(*positions(F.col("gram_h")))).alias("_p")
        )
        .select(F.expr("_p DIV 64").alias("word"), mask.alias("_m"))
        .groupBy("word")
        .agg(F.bit_or("_m").alias("bits"))
    )

    train_grams = _train_gram_hashes(train, id_col, text_col, n)
    probes = train_grams.select(
        id_col,
        "gram_h",
        F.explode(F.array(*positions(F.col("gram_h")))).alias("_p"),
    ).select(
        id_col, "gram_h", F.expr("_p DIV 64").alias("word"), mask.alias("_m")
    )
    # inner join + bit test: a probe whose word row is absent or
    # whose bit is 0 disappears. A gram occurring t times in a doc
    # contributes t*k probe rows (the stream is NOT per-doc-distinct
    # — deduplicating it first would cost exactly the full-gram
    # shuffle this operator exists to avoid), and all t occurrences
    # probe identically, so the surviving count is t*s where s = set
    # probes. The pass test must be >= k, not == k: a true bench
    # gram has s == k, hence count t*k >= k for any t (NO false
    # negatives); a partial-hit repeated gram (s < k, t >= 2) can
    # reach t*s >= k and sneak through — a false positive, which the
    # exact verify below removes like any other.
    survivors = (
        probes.join(F.broadcast(bitset), "word")
        .filter((F.col("bits").bitwiseAND(F.col("_m"))) != 0)
        .groupBy(id_col, "gram_h")
        .agg(F.count("*").alias("_k_set"))
        .filter(F.col("_k_set") >= k)
        .select(id_col, "gram_h")
    )
    # exact verify (kills Bloom false positives): unhinted join — at
    # fixture scale AQE broadcasts bench_grams, at 1e9-gram scale it
    # shuffles ONLY the survivor sliver
    return (
        survivors.join(bench_grams, "gram_h")
        .select(id_col, "gram_h")
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )


def resolve_duplicates(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Pick one canonical document per duplicate cluster.

    ``components`` is ``(node_id, component)`` from
    :func:`..operators.dedup.connected_components` over near-dup
    edges. Canonical = highest ``quality_col``, ties broken by lowest
    id (deterministic). Returns one row per cluster:
    ``(component, canonical_id, n_members, max_quality)``.

    A single ``max_by`` aggregation — map-side partial agg, one
    shuffle on component id (cluster count ≪ doc count). This is the
    keep-side complement of dedup: dedup finds the clusters,
    resolution decides which member survives into the corpus.
    """
    member = docs.join(
        components, docs[id_col] == components["node_id"], "inner"
    ).select(components["component"], docs[id_col], docs[quality_col])
    q = F.col(quality_col).cast("long")
    return member.groupBy("component").agg(
        F.max_by(F.col(id_col), F.struct(q, (-F.col(id_col)).alias("nid"))).alias(
            "canonical_id"
        ),
        F.count("*").alias("n_members"),
        F.max(q).alias("max_quality"),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    k: int,
    salt: str = "wsmp",
) -> DataFrame:
    """Deterministic weight-proportional sample: sequential Poisson
    sampling (Ohlsson) — priority = u / w with u a uniform draw, keep
    the k smallest priorities; inclusion probability is approximately
    proportional to weight (the standard πps estimator used by
    production corpus/survey samplers).

    Determinism across engines: u = (hash32 + 1) / 2^32 from the
    md5-derived 32-bit integer (exact in a double), and the priority
    is ONE correctly-rounded IEEE divide — no pow/ln, whose last-ulp
    results differ between engines. Priorities are therefore
    bit-identical in Spark and DuckDB, so the top-k SET matches, not
    just approximately. A pure narrow projection + TakeOrderedAndProject:
    no shuffle beyond the top-k combine at any corpus size.
    """
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "#"), F.col(key_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    u = (h32 + F.lit(1)).cast("double") / F.lit(float(1 << 32))
    pr = u / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(key_col), F.col(weight_col), pr.alias("priority"))
        .orderBy(F.col("priority").asc(), F.col(key_col).asc())
        .limit(k)
    )


def cluster_balance(
    emb: DataFrame,
    stride: int = 37,
    cap: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "cbal",
    assign: str = "numpy",
    n_cells: int | None = None,
) -> DataFrame:
    """Cluster-balanced corpus sampling: assign every embedding to its
    nearest coarse centroid (the IVF coarse quantizer doubling as a
    topic model) and keep at most ``cap`` vectors per cell, chosen by
    deterministic hash rank — the standard semantic-diversity
    rebalancing pass (head topics are down-sampled to the cap, tail
    topics survive intact), e.g. DeepMind's MassiveWeb cluster
    filtering or SemDeDup-style pruning with the dedup step replaced
    by per-cell quotas.

    Returns kept rows ``(id, cent_id)``.

    Scale: centroid table is stride-sampled (broadcast-sized by
    construction); assignment is vector_search.ivf_assign's
    broadcast + ``max_by`` aggregation (N rows cross the exchange,
    not N·K); the quota is one ``row_number`` window per cell keyed
    by ``cent_id``. Nothing all-pairs, nothing collected.

    ``assign``: ``"numpy"`` (default) is the Arrow-batched BLAS argmax
    the IVF index build uses (~100x the interpreted expression cosine,
    which Spark can't codegen); ``"expr"`` keeps the pure-expression
    path whose arithmetic is bit-identical to the DuckDB oracle. Same
    cell membership either way barring ~1-ulp centroid ties (the
    ivf_knn equivalence contract; re-asserted in test_quality).
    """
    from pyspark.sql import Window

    from cocoindex_data_ingestion_spark.operators.vector_search import (
        ivf_assign,
        ivf_centroids,
    )

    if n_cells is not None:
        # fixed cell count: a constant stride makes K grow with N and
        # the O(N*K) assignment quadratic (indexing.build_ivf_layout's
        # lesson); real deployments size K ~ sqrt(N)
        n = emb.count()
        stride = max(1, -(-n // n_cells))
    cents = ivf_centroids(emb, stride, vec_col, id_col)
    if assign == "numpy":
        from cocoindex_data_ingestion_spark.operators.indexing import (
            _ivf_assign_numpy,
        )

        assigned = _ivf_assign_numpy(
            emb.select(id_col, vec_col), cents, vec_col, id_col
        ).select(id_col, "cent_id")
    else:
        assigned = ivf_assign(
            emb.select(id_col, vec_col), cents, vec_col, id_col
        ).select(id_col, "cent_id")
    qw = Window.partitionBy("cent_id").orderBy(
        hash_rank(F.col(id_col), salt), F.col(id_col)
    )
    return (
        assigned.withColumn("_rk", F.row_number().over(qw))
        .filter(F.col("_rk") <= cap)
        .select(id_col, "cent_id")
    )


def temperature_mix(
    docs: DataFrame,
    budget: int,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-based language rebalancing (the mT5/XLM-R
    p^alpha sampling rule at alpha = 0.5): sample each language
    toward a share proportional to sqrt of its corpus share, so head
    languages are down-weighted and tail languages survive, under a
    total document ``budget``.

    Keeps rows deterministically: per-language keep fraction
    ``f_l = min(1, budget * w_l / (Z * n_l))`` with ``w_l =
    sqrt(n_l / N)``, and a row is kept iff the integer value of its
    8-hex-digit ``hash_rank`` is below ``floor(f_l * 2^32)`` — an
    exact integer comparison, so the kept set is bit-identical across
    engines/partitionings (no float threshold at the row level).
    alpha is fixed at 0.5 because ``sqrt`` is IEEE correctly-rounded
    in every engine while ``pow`` is not — the one choice that keeps
    the per-language cut cross-engine exact. The normalizer Z sums
    1e-9-quantized weights in integer space (stable_sum's trick) so
    even the 4-row sum is order-independent.

    Scale: two tiny aggregations (language cardinality) broadcast
    back against the corpus — the row-level work is a broadcast-join
    + pure filter, zero corpus shuffles (same contract as
    weighted_mix, with the weights *computed from the data* instead
    of supplied).
    """
    stats = docs.groupBy(lang_col).agg(F.count("*").alias("n_l"))
    tot = stats.agg(F.sum("n_l").alias("n_total"))
    w = stats.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.sqrt(F.col("n_l") / F.col("n_total"))
    )
    z = w.agg(
        (
            F.sum(F.floor(F.col("w") * F.lit(1e9) + F.lit(0.5)).cast("long"))
            / F.lit(1e9)
        ).alias("z")
    )
    cuts = w.crossJoin(F.broadcast(z)).select(
        lang_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(budget)) * F.col("w") / F.col("z") / F.col("n_l"),
            )
            * F.lit(4294967296.0)
        )
        .cast("long")
        .alias("cut"),
    )
    rank = F.conv(hash_rank(F.col(id_col), salt), 16, 10).cast("long")
    return docs.join(F.broadcast(cuts), lang_col).filter(rank < F.col("cut"))


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
    round_to: int = 4,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS'23 "Data
    Selection for Language Models via Importance Resampling"):
    score every raw document by how target-like its hashed n-gram
    bag is, ``w(d) = Σ_g log p_target(bucket(g)) / p_raw(bucket(g))``
    with add-1 smoothing over ``n_buckets`` hashed buckets of
    unigrams + bigrams (the paper's hashed-ngram feature space).

    ``target_pred`` marks the rows forming the target distribution
    (e.g. a trusted high-quality subset); the raw distribution is
    the whole input. Scale shape: ONE token-level window pass builds
    the gram stream (codegen, like decontaminate's) and is
    immediately reduced to per-(doc, bucket) counts; the bucket
    statistics are a ``n_buckets``-row broadcast derived from that
    reduced table, and the per-doc sum is an order-independent
    count-weighted fixed-point aggregation — one gram pass + one
    groupBy shuffle regardless of corpus size. Sampling ∝ exp(w)
    then reduces to the existing hash-rank filters.
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.posexplode(tokenize(text_col)).alias("pos", "token"),
    )
    nxt = F.lead("token").over(w)
    uni = toks.select(id_col, "_is_target", F.col("token").alias("gram"))
    bi = (
        toks.withColumn("_nxt", nxt)
        .filter(F.col("_nxt").isNotNull())
        .select(
            id_col,
            "_is_target",
            F.concat_ws(" ", F.col("token"), F.col("_nxt")).alias("gram"),
        )
    )
    grams = uni.unionByName(bi).select(
        F.col(id_col),
        F.col("_is_target"),
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.lit(salt), F.col("gram"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        ).alias("bucket"),
    )
    # ONE pass over the gram stream (r10): reduce it to per-(doc,
    # is_target, bucket) counts — at most 2·n_buckets rows per doc —
    # and derive BOTH the bucket statistics and the per-doc score
    # from the reduced table. The gram stream (tokenize + bigram
    # window over the corpus) was previously recomputed by each of
    # its four consumers (raw counts, target counts, totals, the
    # scoring join): 16 parquet scans in the plan.
    db = (
        grams.groupBy(id_col, "_is_target", "bucket")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    stats = db.groupBy("bucket").agg(
        F.sum("c").alias("c_r"),
        F.sum(
            F.when(F.col("_is_target"), F.col("c")).otherwise(F.lit(0))
        ).alias("c_t"),
    )
    tots = stats.agg(F.sum("c_r").alias("tr"), F.sum("c_t").alias("tt"))
    b = float(n_buckets)
    lr = stats.crossJoin(F.broadcast(tots)).select(
        "bucket",
        (
            F.log((F.col("c_t") + 1.0) / (F.col("tt") + b))
            - F.log((F.col("c_r") + 1.0) / (F.col("tr") + b))
        ).alias("logratio"),
    )
    from cocoindex_data_ingestion_spark.functions.compare import (
        stable_round,
    )

    # count-weighted stable_sum: quantize the bucket's logratio once
    # and multiply by the doc's gram count in exact long arithmetic —
    # term-identical to the gram-level stable_sum it replaces (every
    # gram of the group contributed the same quantized long)
    p = float(10**6)
    q = F.floor(F.col("logratio") * F.lit(p) + F.lit(0.5)).cast("long")
    return (
        db.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            stable_round(F.sum(F.col("c") * q) / F.lit(p), round_to).alias(
                "dsir_weight"
            )
        )
    )


# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB): character classes + bounded repetition only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """PII scrubbing (the standard pretraining privacy pass, e.g.
    BigScience/ROOTS): count and replace each pattern class with a
    ``[LABEL]`` placeholder, applied in the dict's order.

    Adds ``n_<label>`` count columns plus a ``<text_col>_redacted``
    column. Pure Column expressions (JVM regex inside whole-stage
    codegen) — a single scan pass at any corpus size; counts are
    taken BEFORE redaction so later patterns can't eat earlier
    matches' context.
    """
    patterns = patterns or PII_PATTERNS
    out = df
    for label, pat in patterns.items():
        out = out.withColumn(
            f"n_{label}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    red = F.col(text_col)
    for label, pat in patterns.items():
        red = F.regexp_replace(red, pat, f"[{label.upper()}]")
    return out.withColumn(f"{text_col}_redacted", red)


def boilerplate_strip(
    docs: DataFrame,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    scope_col: str = "source",
) -> DataFrame:
    """Boilerplate-paragraph STRIPPING (the transform companion to
    ``dedup.paragraph_dedup_stats``'s accounting): a paragraph whose
    whitespace-normalized fingerprint appears in >= ``min_docs``
    DISTINCT documents of the same ``scope_col`` (source/domain —
    where navboxes, headers, and license footers repeat) is removed,
    and each document is reassembled from its surviving paragraphs in
    original order. The RefinedWeb/C4 cleaning step that runs between
    dedup and tokenization.

    Plan (three exchanges at any corpus size, all on bounded keys):
    paragraph explode stays in the scan stage; (scope, fingerprint)
    distinct-doc counts are a map-side-combinable aggregate; the
    boilerplate-key table joins back UNHINTED — it is corpus-derived,
    so the size call is left to AQE, which broadcasts it when the
    filtered key set turns out small (the usual case: boilerplate
    keys ≪ paragraphs) and falls back to a shuffle join when a
    pathological corpus makes it large; the rebuild is one groupBy on
    the doc id whose per-group state is that document's own
    paragraphs (bounded by document length, never corpus size).
    Reassembly normalizes inter-paragraph whitespace to exactly one
    blank line — documented semantics, identical in the DuckDB twin.

    Returns (id, n_paras, n_removed, clean_text), empty-normalized
    paragraphs dropped; a fully-boilerplate document keeps its row
    with clean_text = ''.
    """
    paras = (
        docs.select(
            F.col(id_col).alias("id"),
            F.col(scope_col).alias("scope"),
            F.posexplode(F.split(F.col(text_col), r"\n{2,}")).alias(
                "idx", "para"
            ),
        )
        .withColumn(
            "pnorm", F.trim(F.regexp_replace("para", r"\s+", " "))
        )
        .filter(F.length("pnorm") > 0)
        .select("id", "scope", "idx", "para", F.md5("pnorm").alias("ph"))
    )
    common = (
        paras.groupBy("scope", "ph")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("scope", "ph", F.lit(1).alias("_boiler"))
    )
    marked = paras.join(common, ["scope", "ph"], "left").withColumn(
        "b", F.coalesce(F.col("_boiler"), F.lit(0))
    )
    return marked.groupBy("id").agg(
        F.count("*").alias("n_paras"),
        F.sum("b").alias("n_removed"),
        F.concat_ws(
            "\n\n",
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "para", "b"))
                    ),
                    lambda x: x["b"] == 0,
                ),
                lambda x: x["para"],
            ),
        ).alias("clean_text"),
    )


def negative_samples(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    seed: str = "neg",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training:
    ``k`` pseudo-random negatives per anchor via an md5 hash of
    (seed, anchor, j) — stable under repartitioning and re-runs, so a
    pair never flips between epochs — with FALSE negatives removed by
    dropping candidates that share a MinHash-LSH bucket with their
    anchor (a random negative that is a near-dup of the anchor
    poisons a contrastive objective).

    Dense-id contract: ids are 0..N−1 (at scale the layout's row rank
    provides this). NO broadcast hints anywhere: the LSH bucket table
    is bands × corpus-sized, so the anti-filter runs as shuffle joins
    on the bucket key — at 100 TB a pre-bucketed layout makes the
    probe co-located.

    Returns (id_col, j, neg_id).
    """
    from cocoindex_data_ingestion_spark.functions.text import bm25_tokens
    from cocoindex_data_ingestion_spark.operators import dedup

    nonempty = docs.filter(F.size(bm25_tokens(text_col)) > 0)
    # materialized once (r10): both sides of the near-dup anti-filter
    # probe this table, and recomputing it means re-running the whole
    # MinHash pipeline (tokenize + num_hashes hash evaluations over
    # every token) per side — the narrow (id, bucket) table is
    # thousands of times smaller than that recompute
    buckets = dedup.minhash_buckets(
        nonempty, num_hashes=num_hashes, bands=bands,
        id_col=id_col, text_col=text_col,
    ).localCheckpoint(eager=False)
    n = docs.agg(F.count("*").alias("n"))
    cand = (
        docs.select(id_col)
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
            "n",
        )
        .withColumn(
            "raw",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", F.lit(seed), F.col(id_col), F.col("j"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % F.col("n"),
        )
        .withColumn(
            "neg_id",
            F.when(F.col("raw") == F.col(id_col), (F.col("raw") + 1) % F.col("n"))
            .otherwise(F.col("raw")),
        )
    )
    ba = buckets.select(F.col("id").alias(id_col), "bucket")
    bb = buckets.select(F.col("id").alias("neg_id"), F.col("bucket"))
    near_dup = (
        cand.join(ba, id_col)
        .join(bb, ["neg_id", "bucket"])
        .select(id_col, "j", "neg_id")
        .distinct()
    )
    return cand.select(id_col, "j", "neg_id").join(
        near_dup, [id_col, "j", "neg_id"], "left_anti"
    )


def token_budget_select(
    docs: DataFrame,
    budget_per_group: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fill a per-group token budget greedily, longest documents
    first — the deterministic "cap each language/source at N tokens"
    step of assembling a pretraining mix (the mT5/ROOTS per-language
    cap, made reproducible).

    A doc is selected when the running token total of its group
    BEFORE it is still under the budget (so the budget may be
    overshot by at most one document — the standard greedy-fill
    contract). Ranking is (token count DESC, id ASC) — fully
    deterministic.

    Scale shape: the running sum is a window PARTITIONED BY the group
    column (per-group sorted partitions, never a global single-
    partition window); one shuffle on the group key.

    Returns (id, group, n_toks, cum_before) for selected docs.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("n_toks").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(group_col),
            F.size(tokenize(text_col)).cast("long").alias("n_toks"),
        )
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)).cast("long")
        )
        .filter(F.col("cum_before") < budget_per_group)
        .select(id_col, group_col, "n_toks", "cum_before")
    )


def epoch_shuffle_keys(
    docs: DataFrame,
    epochs: int = 3,
    id_col: str = "doc_id",
    seed: str = "ep",
) -> DataFrame:
    """Deterministic multi-epoch shuffle ORDER KEYS: for each epoch e,
    key = md5(seed#e#id). Writing each epoch sorted by its key IS the
    epoch's permutation — reproducible across runs and resumable
    mid-epoch (the key is a pure function of (seed, epoch, id), no
    stored RNG state), with no global row-number window anywhere.
    Sorting by key at write time is a range-partitioned sort — the
    scalable global order primitive.

    Returns (epoch, id, skey) — one row per doc per epoch.
    """
    return docs.select(F.col(id_col)).select(
        F.explode(
            F.array(*[F.lit(e) for e in range(1, epochs + 1)])
        ).alias("epoch"),
        F.col(id_col),
    ).withColumn(
        "skey",
        F.md5(F.concat_ws("#", F.lit(seed), F.col("epoch"), F.col(id_col))),
    )


def temporal_split_assign(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
) -> DataFrame:
    """Leakage-safe TEMPORAL train/val/test assignment: rank every
    row by event time (id tie-break) and cut at exact rank quantiles
    — train is strictly the past, test strictly the future, which is
    the split discipline evaluation on time-dependent data needs
    (the hash split of ``hash_rank`` deliberately ignores time and
    WOULD leak future context into training here).

    Rank assignment uses the ``as_ltable`` partition-offset shape
    (range repartition + per-partition row_number + broadcast
    offsets) — no global single-partition window at any size. Cutoffs
    are exact integer ranks (floor(N·frac)), so the split sizes are
    deterministic to the row.

    Returns each row with its ``split`` label plus the rank (useful
    for windowed retraining audits)."""
    from cocoindex_data_ingestion_spark.datamodel import as_ltable

    ranked = as_ltable(df, [ts_col, id_col], pos_col="_rank")
    total = df.agg(F.count("*").alias("_total"))
    c1 = F.floor(F.col("_total") * F.lit(train_frac)).cast("long")
    c2 = F.floor(F.col("_total") * F.lit(train_frac + val_frac)).cast("long")
    split = (
        F.when(F.col("_rank") < c1, F.lit("train"))
        .when(F.col("_rank") < c2, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("split", split)
        .drop("_total")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    round_to: int = 4,
) -> DataFrame:
    """Per-group winsorization (outlier capping): clamp ``value_col``
    to its group's [p_lo, p_hi] exact percentiles. Returns the rows
    with ``value_w`` (clamped), plus the group bounds — the standard
    robust-feature step before scaling/training.

    Plan: one percentile aggregation per group (bounded output), the
    bounds table BROADCAST back onto the stream — the rows never
    re-shuffle. Exact percentiles keep the oracle comparison exact;
    at 100 TB swap in the mergeable histogram sketch
    (sketches.histogram_quantiles) for the bounds pass.
    """
    from ..functions.compare import stable_round

    v = F.col(value_col).cast("double")
    bounds = df.groupBy(*group_cols).agg(
        stable_round(F.percentile(v, F.lit(p_lo)), round_to).alias("_lo"),
        stable_round(F.percentile(v, F.lit(p_hi)), round_to).alias("_hi"),
    )
    return (
        df.join(F.broadcast(bounds), group_cols)
        .select(
            *df.columns,
            F.col("_lo").alias("lo_bound"),
            F.col("_hi").alias("hi_bound"),
            stable_round(
                F.least(F.greatest(v, F.col("_lo")), F.col("_hi")), round_to
            ).alias("value_w"),
        )
    )


def neyman_allocation(
    df: DataFrame,
    strata_col: str,
    value_cents: "F.Column",
    budget: int = 1000,
    round_to: int = 4,
) -> DataFrame:
    """Neyman-optimal sample allocation: given a total sampling
    budget, allocate to each stratum proportionally to ``N_h · σ_h``
    (population size × within-stratum standard deviation) — the
    minimum-variance design for stratified estimation (Neyman, JRSS
    1934). A pipeline uses it to size per-source QA samples or
    labeling budgets instead of naive proportional draws.

    ONE scan: per-stratum counts and exact INTEGER moment sums (pass
    an integer-valued column: cents, chars, tokens — headroom is
    Σ v² < 2⁶³, so rescale coarse units first at extreme scales);
    σ from the closed-form variance; the allocation share divides two
    identically-derived doubles and rounds to an integer seat count.
    Output: ``(stratum, n_rows, sigma, alloc)``.
    """
    from ..functions.compare import stable_round

    per = (
        df.select(F.col(strata_col).alias("_s"), value_cents.alias("_c"))
        .groupBy("_s")
        .agg(
            F.count("*").alias("_n"),
            F.sum("_c").alias("_s1"),
            F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
        )
    )
    nd = F.col("_n").cast("double")
    var = (
        F.col("_s2").cast("double")
        - F.col("_s1").cast("double") * F.col("_s1").cast("double") / nd
    ) / nd
    sized = per.withColumn("_sig", F.sqrt(F.greatest(var, F.lit(0.0))))
    # strata are few, but the share denominator must still be
    # order-independent: fixed-point sum of the N_h·σ_h terms
    from ..functions.compare import stable_sum

    tot = sized.agg(stable_sum(nd * F.col("_sig"), 4).alias("_t"))
    return (
        sized.crossJoin(F.broadcast(tot))
        .select(
            F.col("_s").alias(strata_col),
            F.col("_n").cast("long").alias("n_rows"),
            stable_round(F.col("_sig"), round_to).alias("sigma"),
            F.floor(
                F.lit(float(budget)) * (nd * F.col("_sig")) / F.col("_t")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy(strata_col)
    )
