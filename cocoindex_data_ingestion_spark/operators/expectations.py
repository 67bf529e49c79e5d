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
