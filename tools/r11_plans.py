"""Capture .explain('formatted') for named queries (no timing).

Usage: python tools/r11_plans.py <sf_dir> <tag> <name>...
Writes plans/r10/<name>_<tag>.txt.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.session import get_spark


def main() -> None:
    sf_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r11")
    os.makedirs(plan_dir, exist_ok=True)
    spark = get_spark("r11_plans")
    qs = entrymod.queries()
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name, flush=True)


if __name__ == "__main__":
    main()
