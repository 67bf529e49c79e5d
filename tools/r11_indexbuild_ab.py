"""Interleaved A/B of build_search_index old-vs-new (r11).

Usage: python tools/r11_indexbuild_ab.py <sf_dir> <reps> <old_indexing_py>

Mode A = the committed OLD operators/indexing.py (dumped via
`git show <rev>:...indexing.py > /tmp/old_indexing.py`), loaded as a
side-by-side module. Mode B = HEAD. Reps interleaved A,B,A,B in one
session (SCALING.md variance protocol), each building the full
_ensure_index option set into a throwaway dir.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from cocoindex_data_ingestion_spark.operators import indexing as new_ix
from cocoindex_data_ingestion_spark.session import get_spark


def load_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    sf_dir, reps, old_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    old_ix = load_module(old_path, "old_indexing")
    spark = get_spark("r11_indexbuild_ab")
    docs = entrymod._t(spark, sf_dir, "documents")
    emb = entrymod._t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)

    def build(mod, tag: str) -> float:
        idx = tempfile.mkdtemp(prefix=f"r11_idx_{tag}_")
        spark.sparkContext.setJobDescription(f"build:{tag}")
        t0 = time.time()
        mod.build_search_index(
            docs, emb, idx,
            lsh_bits=entrymod._LSH_BITS,
            ivf_stride=entrymod._IVF_STRIDE,
            pq=True, pq_m=entrymod._PQ_M, pq_k=entrymod._PQ_K,
            pq_sub_d=entrymod._PQ_SUBD, positions=True,
        )
        dt = round(time.time() - t0, 3)
        shutil.rmtree(idx, ignore_errors=True)
        return dt

    # warm both arms once at the smallest SF
    sdocs = entrymod._t(spark, "/root/testdata/sf0.001", "documents")
    semb = entrymod._t(spark, "/root/testdata/sf0.001", "embeddings").filter(
        F.col("vec_id") != 0
    )
    for mod, tag in ((old_ix, "warmA"), (new_ix, "warmB")):
        idx = tempfile.mkdtemp(prefix="r11_idx_warm_")
        mod.build_search_index(
            sdocs, semb, idx, lsh_bits=entrymod._LSH_BITS,
            ivf_stride=entrymod._IVF_STRIDE, pq=True,
            pq_m=entrymod._PQ_M, pq_k=entrymod._PQ_K,
            pq_sub_d=entrymod._PQ_SUBD, positions=True,
        )
        shutil.rmtree(idx, ignore_errors=True)

    a, b = [], []
    for rep in range(reps):
        a.append(build(old_ix, f"A_old_rep{rep}"))
        b.append(build(new_ix, f"B_new_rep{rep}"))
        print(f"rep{rep}: old={a[-1]} new={b[-1]}", flush=True)
    print(f"FINAL old={a} min={min(a)} | new={b} min={min(b)}")


if __name__ == "__main__":
    main()
