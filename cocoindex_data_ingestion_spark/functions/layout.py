"""Data-layout keys: Z-order (Morton) interleaving for multi-column
data skipping.

Parquet row-group pruning works off per-file/rowgroup min-max stats,
which a single-column sort only tightens for that column. Sorting by
the interleaved Z-value tightens the bounding box of BOTH columns in
every file, so range predicates on either column skip most files —
the layout Delta's OPTIMIZE ZORDER BY and Iceberg's sort orders
implement, reproduced here as a pure Column expression (bit ops in
whole-stage codegen, no UDF).

Columns are first rank-normalized to ``bits``-bit integers by the
caller (or passed as already-bounded ints); ``zorder_key`` then
interleaves bit i of each column into position n_cols·i + j.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column (as longs).

    With c columns the result uses c·bits bits — keep c·bits ≤ 62.
    Values are masked to ``bits`` bits; callers normalize ranges
    (e.g. ``ntile``/rank or fixed-point scale) beforehand so the mask
    keeps full resolution."""
    n = len(cols)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a long")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(
                F.shiftleft(bit, i * n + j).cast("long")
            )
    return out


def write_zordered(
    df,
    path: str,
    cols: list[str],
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet clustered by the Z-curve: repartitionByRange on
    the z-key gives files whose (col1, col2, ...) bounding boxes are
    small in EVERY dimension — the property min/max pruning needs."""
    z = zorder_key(cols, bits).alias("_z")
    out = df.withColumn("_z", z).repartitionByRange("_z").sortWithinPartitions("_z")
    writer = out.drop("_z").write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
