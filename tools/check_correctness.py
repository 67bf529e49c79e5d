"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB at the given scale factor, then compares them TWO ways:

1. **Strict (driver-identical)**: both results go to pandas
   (``toPandas()`` / ``duckdb .df()`` — so DuckDB HUGEINT becomes
   float64, exactly as the driver sees it), columns sorted by name,
   rows ``sort_values`` over all columns (array cells raise there,
   exactly as the driver's canonicalizer does), then a dtype-KIND-
   sensitive row hash: an int64 Spark column against a float64 oracle
   column FAILS even when the values are numerically equal. This is
   the class that shipped three driver-reds in round 3 while the old
   lax gate stayed green.
2. **Lax (legacy)**: order-insensitive multiset of numerically
   coerced values — kept only as a diagnostic so a strict failure is
   labeled either ``value-wrong`` (lax also fails) or
   ``driver-incompat`` (values equal, dtype/canon mismatch).

Either failure mode exits non-zero.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import TABLES


# -- strict, driver-identical canonicalization --------------------------------


def _driver_canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalization.

    Columns sorted by name; datetimes unit-normalized to ns; integer
    widths collapsed to int64 and float widths to float64 (pandas'
    row hash is width-insensitive but KIND-sensitive, matching the
    observed driver behavior: int32==int64, int64!=float64); object
    NaN collapsed to None; then ``sort_values`` over ALL columns —
    which raises TypeError on array cells, exactly like the driver.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "M":
            df[c] = df[c].astype("datetime64[ns]")
        elif k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "O":
            bad = df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray, dict, set)))
            if bad.any():
                raise TypeError(
                    f"unhashable type in column {c!r} "
                    f"(driver sort_values dies on array cells)"
                )
            df[c] = df[c].where(pd.notna(df[c]), None)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _strict_diffs(spdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Driver-identical comparison; returns human-readable mismatch
    messages (empty list == the driver would report hash_match)."""
    msgs: list[str] = []
    if sorted(spdf.columns) != sorted(odf.columns):
        return [f"cols spark={sorted(spdf.columns)} duck={sorted(odf.columns)}"]
    if len(spdf) != len(odf):
        msgs.append(f"rowcount spark={len(spdf)} duck={len(odf)}")
    try:
        cs = _driver_canon(spdf)
    except TypeError as e:
        return msgs + [f"spark side not driver-canonicalizable: {e}"]
    try:
        co = _driver_canon(odf)
    except TypeError as e:
        return msgs + [f"oracle side not driver-canonicalizable: {e}"]
    if msgs:
        return msgs
    for c in cs.columns:
        ks, ko = cs[c].dtype.kind, co[c].dtype.kind
        if ks != ko:
            msgs.append(
                f"dtype kind mismatch col={c!r} spark={cs[c].dtype} "
                f"duck={co[c].dtype} (driver hash_match would be false)"
            )
    if msgs:
        return msgs
    hs = pd.util.hash_pandas_object(cs, index=False).to_numpy()
    ho = pd.util.hash_pandas_object(co, index=False).to_numpy()
    if not np.array_equal(hs, ho):
        bad = np.nonzero(hs != ho)[0][:3]
        for i in bad:
            msgs.append(
                f"row hash differs at canon row {i}: "
                f"spark={cs.iloc[int(i)].to_dict()} duck={co.iloc[int(i)].to_dict()}"
            )
    return msgs


# -- legacy lax comparison (diagnostic only) ----------------------------------


def _norm_cell(v):
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, np.ndarray):
        return tuple(_norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _lax_equal(spdf: pd.DataFrame, odf: pd.DataFrame) -> bool:
    srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
    orows = [tuple(r) for r in odf.itertuples(index=False, name=None)]
    if sorted(spdf.columns) != sorted(odf.columns) or len(srows) != len(orows):
        return False
    return _normalize(srows, list(spdf.columns)) == _normalize(orows, list(odf.columns))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        spdf = sdf.toPandas()
        t_spark = time.time() - t0

        if name not in oracles:
            print(f"  {name:28s} rows={len(spdf):6d} (rows-only, no oracle) "
                  f"[spark {t_spark:.1f}s]")
            continue

        t0 = time.time()
        odf = con.execute(oracles[name]).df()
        t_duck = time.time() - t0

        msgs = _strict_diffs(spdf, odf)
        ok = not msgs
        if ok:
            status = "OK "
        elif _lax_equal(spdf, odf):
            status = "FAIL(driver-incompat)"
        else:
            status = "FAIL(value-wrong)"
        print(
            f"  {name:28s} {status} rows={len(spdf):6d} "
            f"[spark {t_spark:.1f}s duck {t_duck:.1f}s]"
        )
        for m in msgs:
            print(f"      {m}")
        if not ok:
            failures.append(name)

    print()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
