"""Data-quality expectations: declarative row-level rules with
violation accounting — the semantic-level complement of
``sources/files.py``'s parse-level quarantine (Great-Expectations /
Delta-constraints shape, engine-native).

A rule is just a boolean Column, so every check stays inside
whole-stage codegen and the whole audit is ONE scan: violations per
rule come out of the same pass as conditional aggregates, and the
pass/quarantine split is a codegen'd filter — no per-rule jobs, no
UDFs, no second read of a 100 TB input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def annotate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Add one boolean ``ok_<name>`` column per rule plus ``_valid``
    (conjunction). NULL rule results count as violations (SQL
    three-valued logic would otherwise let NULLs sneak through)."""
    if not rules:
        raise ValueError("rules must be non-empty")
    out = df
    flags = []
    for name, cond in rules.items():
        col = F.coalesce(cond, F.lit(False))
        out = out.withColumn(f"ok_{name}", col)
        flags.append(F.col(f"ok_{name}"))
    valid = flags[0]
    for f in flags[1:]:
        valid = valid & f
    return out.withColumn("_valid", valid)


def split(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(passing rows, quarantined rows with their per-rule flags)."""
    ann = annotate(df, rules)
    ok_cols = [f"ok_{n}" for n in rules]
    good = ann.filter(F.col("_valid")).drop(*ok_cols, "_valid")
    bad = ann.filter(~F.col("_valid")).drop("_valid")
    return good, bad


def summarize(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One-row audit: total rows, per-rule violation counts, rows
    fully valid — a single conditional-aggregate scan."""
    ann = annotate(df, rules)
    aggs = [F.count("*").alias("n_rows")] + [
        F.count(F.when(~F.col(f"ok_{n}"), True)).alias(f"bad_{n}")
        for n in rules
    ] + [F.count(F.when(F.col("_valid"), True)).alias("n_valid")]
    return ann.agg(*aggs)


def k_anonymity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    k: int = 5,
) -> DataFrame:
    """Privacy audit: quasi-identifier combinations appearing in
    fewer than ``k`` rows (the re-identifiable groups a release
    policy must suppress or generalize). One groupBy on the QI
    columns; output bounded by the number of rare combos."""
    return (
        df.groupBy(*quasi_identifiers)
        .agg(F.count("*").alias("group_size"))
        .filter(F.col("group_size") < k)
    )


def functional_dependency(
    df,
    lhs: list[str],
    rhs: str,
    round_to: int = 6,
):
    """Audit a candidate functional dependency ``lhs → rhs``: does
    every lhs group map to exactly one rhs value? Returns one row —
    ``(n_groups, n_violating_groups, n_violating_rows, max_rhs_card,
    fd_strength)`` — where strength is the fraction of rows whose
    group is single-valued. The schema-inference / data-contract
    primitive: "is order_id really a key for customer_id in this
    feed?" asked as a query, graded in exact integers.

    ONE shuffle to (lhs, rhs) value counts; group verdicts are a
    re-aggregation of that contracted table (distinct-rhs per group,
    rows per group), never a second corpus pass.
    """
    from pyspark.sql import functions as F

    from ..functions.compare import stable_round
    from ..functions.parallel import spread_python_stage

    # Both aggregations below cluster by (a superset of) lhs, and
    # HashPartitioning on lhs satisfies ClusteredDistribution for
    # both — so the guarded lhs-keyed spread replaces the (lhs, rhs)
    # partial build's single task on a one-split scan with a
    # distributed build whose exchange BOTH groupBys reuse (r10,
    # guide §2.4/§2.5; no-op on any multi-split real-scale input).
    df = spread_python_stage(df.select(*lhs, rhs), *lhs)
    vals = (
        df.groupBy(*[F.col(c) for c in lhs], F.col(rhs))
        .agg(F.count("*").alias("_n"))
    )
    groups = vals.groupBy(*[F.col(c) for c in lhs]).agg(
        F.count("*").alias("_card"),
        F.sum("_n").alias("_rows"),
    )
    return groups.agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_card") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("_card") > 1, F.col("_rows")).otherwise(0))
        .cast("long")
        .alias("n_violating_rows"),
        F.max("_card").cast("long").alias("max_rhs_card"),
        stable_round(
            F.sum(
                F.when(F.col("_card") == 1, F.col("_rows")).otherwise(0)
            ).cast("double")
            / F.sum("_rows").cast("double"),
            round_to,
        ).alias("fd_strength"),
    )


def benford_audit(
    df,
    amount_cents,
    round_to: int = 6,
):
    """Benford's-law first-digit audit of a positive amount column:
    per digit 1-9 the observed share vs the Benford expectation
    ``log10(1 + 1/d)``, plus each digit's chi-square contribution —
    the classic anomaly/fabrication screen for financial and metric
    feeds. A uniform or truncated generator fails it loudly; organic
    multi-scale amounts pass.

    The first digit comes from the INTEGER cents' decimal string
    (first character) — no float log10 anywhere near a boundary, so
    the digit histogram is engine-exact; one scan + a 9-row
    aggregate.
    """
    from pyspark.sql import functions as F

    from ..functions.compare import stable_round

    import math

    digit = F.substring(amount_cents.cast("string"), 1, 1).cast("int")
    obs = (
        df.select(digit.alias("digit"))
        .filter(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("_t"))
    rows = obs.crossJoin(F.broadcast(tot))
    exp_map = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(math.log10(1.0 + 1.0 / d)))
        ]
    )
    e = exp_map[F.col("digit")]
    share = F.col("n_obs").cast("double") / F.col("_t").cast("double")
    contrib = (
        (F.col("n_obs").cast("double") - F.col("_t").cast("double") * e)
        * (F.col("n_obs").cast("double") - F.col("_t").cast("double") * e)
        / (F.col("_t").cast("double") * e)
    )
    return rows.select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        stable_round(share, round_to).alias("share"),
        stable_round(e, round_to).alias("benford_share"),
        stable_round(contrib, round_to).alias("chi2_contrib"),
    ).orderBy("digit")


def l_diversity_audit(
    df: DataFrame,
    quasi_identifiers: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """Privacy audit companion to :func:`k_anonymity_audit`:
    quasi-identifier groups whose SENSITIVE attribute takes fewer
    than ``l`` distinct values — groups that k-anonymity alone calls
    safe but that still leak the sensitive value outright (the
    homogeneity attack l-diversity exists to catch; Machanavajjhala
    et al., ICDE 2006). Output: the violating groups with their size
    and sensitive-value cardinality, bounded by the violation count.

    One shuffle to (QI, sensitive) value counts; group verdicts are a
    re-aggregation of the contracted table (the
    functional_dependency plan — l-diversity is "lhs→rhs must NOT be
    functional" turned into a per-group report).
    """
    vals = (
        df.groupBy(
            *[F.col(c) for c in quasi_identifiers], F.col(sensitive_col)
        )
        .agg(F.count("*").alias("_n"))
    )
    return (
        vals.groupBy(*[F.col(c) for c in quasi_identifiers])
        .agg(
            F.sum("_n").cast("long").alias("group_size"),
            F.count("*").cast("long").alias("sensitive_cardinality"),
        )
        .filter(F.col("sensitive_cardinality") < l)
    )


# -- path / filename safety audit (utils/path_validator.py) -------------------

# validate_path suspicious patterns (:72-82), checked lowercased and
# in list order against the path string. The reference matches the
# RESOLVED path; a batch audit has no filesystem, so this checks the
# raw string — stricter on unresolved '..' traversal, documented.
PATH_SUSPICIOUS = [
    "/etc/passwd",
    "/etc/shadow",
    "c:\\windows\\system32",
    "c:\\windows\\system",
    "/proc/",
    "/sys/",
    "\\..\\",
    "/../",
    "\x00",
]

# validate_filename forbidden characters (:123), in list order
FILENAME_FORBIDDEN = ["/", "\\", "\x00", ":", "*", "?", '"', "<", ">", "|"]

# reserved Windows device names (:131-135)
FILENAME_RESERVED = (
    ["CON", "PRN", "AUX", "NUL"]
    + [f"COM{i}" for i in range(1, 10)]
    + [f"LPT{i}" for i in range(1, 10)]
)

FILENAME_MAX_LEN = 255  # :142


def _label(pat: str) -> str:
    return pat.replace("\x00", "<nul>")


def path_safety_audit(
    df: DataFrame, path_col: str = "source_path"
) -> DataFrame:
    """Row-level twin of ``PathValidator.validate_path`` +
    ``validate_filename`` (path_validator.py:14-149): adds
    ``filename`` (basename), ``violation`` (the FIRST failing check
    in the reference's raise order: empty path → suspicious pattern →
    forbidden filename char → reserved device name → length → hidden
    file; ``'ok'`` if none), and ``is_safe``.

    Check order matters: the reference raises on the first hit, so a
    path can carry several defects but reports one — the audit
    reproduces that precedence exactly. Basename extraction mirrors
    ``os.path.basename`` for '/'-separated paths (backslashes stay in
    the name, where the forbidden-char check catches them). Pure
    codegen expressions, one scan, no shuffle."""
    p = F.col(path_col)
    lp = F.lower(p)
    fname = F.element_at(F.split(p, "/"), -1)
    name_no_ext = F.element_at(F.split(fname, r"\."), 1)
    checks: list[tuple[Column, str]] = [
        (p.isNull() | (p == ""), "empty")
    ]
    checks += [
        (lp.contains(F.lit(pat)), f"suspicious:{_label(pat)}")
        for pat in PATH_SUSPICIOUS
    ]
    nonempty = F.length(fname) > 0
    checks += [
        (nonempty & fname.contains(F.lit(ch)), f"forbidden:{_label(ch)}")
        for ch in FILENAME_FORBIDDEN
    ]
    checks += [
        (
            nonempty & F.upper(name_no_ext).isin(FILENAME_RESERVED),
            "reserved",
        ),
        (nonempty & (F.length(fname) > FILENAME_MAX_LEN), "too_long"),
        (nonempty & fname.startswith("."), "hidden"),
    ]
    violation = F.lit("ok")
    for cond, label in reversed(checks):
        violation = F.when(cond, F.lit(label)).otherwise(violation)
    return df.withColumn("filename", fname).withColumn(
        "violation", violation
    ).withColumn("is_safe", violation == "ok")
