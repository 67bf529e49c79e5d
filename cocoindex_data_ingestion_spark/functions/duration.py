"""Duration parsing: ISO-8601 + human formats → microseconds.

Reference: src/base/duration.rs:170 (768 LoC parser handling
ISO-8601 `PT1H30M` / `P1DT2H` and human `"1h 30m"`, `"2 days"`,
backing TimeDelta ingestion).

Engine form: a pure Column expression (no UDF) — lowercase the
input, extract (value, unit) token pairs with one regex that covers
both notations (`p1dt2h30m` lowercases to tokens `1d 2h 30m`), map
units to µs multipliers, sum. The same regex/CASE runs in DuckDB for
the oracle.

Scope note (documented divergence): ISO month/year designators are
NOT supported — `m` always means minutes (the reference's chrono
Duration has no calendar months either).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# longest-alternatives-first so 'ms' beats 'm', 'days' beats 'd'.
# No \b terminator: compact ISO runs like 'pt1h30m' put a digit right
# after the unit (no word boundary), and RE2 (the oracle engine) has
# no lookahead — ordered alternation alone disambiguates.
DURATION_TOKEN_RE = (
    r"(\d+(?:\.\d+)?)\s*"
    r"(days?|hours?|minutes?|mins?|seconds?|secs?|ms|us|d|h|m|s)"
)

_UNIT_US = {
    "d": 86_400_000_000.0,
    "h": 3_600_000_000.0,
    "m": 60_000_000.0,
    "s": 1_000_000.0,
    "ms": 1_000.0,
    "us": 1.0,
}


def _unit_case_spark(unit: Column) -> Column:
    c = F.when(unit.startswith("d"), F.lit(_UNIT_US["d"]))
    c = c.when(unit.startswith("h"), F.lit(_UNIT_US["h"]))
    c = c.when(unit == "ms", F.lit(_UNIT_US["ms"]))
    c = c.when(unit == "us", F.lit(_UNIT_US["us"]))
    c = c.when(unit.startswith("m"), F.lit(_UNIT_US["m"]))
    return c.otherwise(F.lit(_UNIT_US["s"]))  # s / sec / seconds


def parse_duration_us(col: Column | str) -> Column:
    """Duration string → total microseconds (long); NULL-safe, 0 for
    no recognizable tokens."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    vals = F.regexp_extract_all(low, F.lit(DURATION_TOKEN_RE), 1)
    units = F.regexp_extract_all(low, F.lit(DURATION_TOKEN_RE), 2)
    pairs = F.zip_with(
        vals,
        units,
        lambda v, u: v.cast("double") * _unit_case_spark(u),
    )
    total = F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)
    return F.floor(total + F.lit(0.5)).cast("long")


def parse_duration_us_sql(expr: str) -> str:
    """DuckDB twin of :func:`parse_duration_us`."""
    re_sql = DURATION_TOKEN_RE.replace("'", "''")
    # coalesce: list_sum(empty) is NULL in DuckDB but the Spark
    # aggregate's 0.0 seed yields 0
    return (
        f"CAST(floor(coalesce(list_sum(list_transform("
        f"list_zip(regexp_extract_all(lower({expr}), '{re_sql}', 1), "
        f"regexp_extract_all(lower({expr}), '{re_sql}', 2)), "
        f"p -> CAST(p[1] AS DOUBLE) * (CASE WHEN p[2] LIKE 'd%' THEN 86400000000.0 "
        f"WHEN p[2] LIKE 'h%' THEN 3600000000.0 WHEN p[2] = 'ms' THEN 1000.0 "
        f"WHEN p[2] = 'us' THEN 1.0 WHEN p[2] LIKE 'm%' THEN 60000000.0 "
        f"ELSE 1000000.0 END))), 0.0) + 0.5) AS BIGINT)"
    )
