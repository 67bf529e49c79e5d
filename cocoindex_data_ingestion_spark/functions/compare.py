"""Cross-engine-stable rounding for oracle comparison.

``round()`` differs between engines at representation boundaries:
Spark rounds the exact decimal expansion of the double (BigDecimal
HALF_UP: 0.49334999999999996 → 0.4933) while DuckDB's float round
effectively computes round(x·10⁴)/10⁴ (→ 0.4934). Any rounded score
column would therefore flip at random boundaries.

``stable_round`` instead uses only IEEE-754 double ops — multiply,
add, floor, divide — which every engine executes identically:

    floor(x · 10ⁿ + 0.5) / 10ⁿ

Both sides of every oracle-checked query round through this.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, n: int = 4) -> Column:
    p = float(10**n)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def stable_round_sql(expr: str, n: int = 4) -> str:
    p = float(10**n)
    return f"floor(({expr}) * {p} + 0.5) / {p}"
