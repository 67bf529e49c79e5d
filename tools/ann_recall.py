"""ANN quality probe: recall@k of every approximate path vs exact.

For Q sampled query vectors, run the same operator code the
registered queries use (``knn_lsh``, ``ivf_knn``, ``pq_knn`` with the
production parameters from ``__spark_entry__``) and score each
method's top-k id set against exact brute-force ``knn``.

This is measurement tooling, not a serving path, so a driver-side
loop over Q queries is acceptable: each iteration is one distributed
top-k job, and the loop exists only to produce the recall table
recorded in SCALING.md.

Usage: python tools/ann_recall.py [sf_dir] [n_queries]
Prints one JSON line: {"sf": ..., "k": 10, "n_queries": Q,
                       "recall": {"lsh": r, "ivf": r, "pq": r}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from cocoindex_data_ingestion_spark.operators import vector_search
from cocoindex_data_ingestion_spark.session import get_spark
from cocoindex_data_ingestion_spark.sources.tables import load_table

K = 10


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    spark = get_spark("ann_recall")
    emb = load_table(spark, "embeddings", sf_dir).cache()
    n_vec = emb.count()

    # deterministic spread of query ids across the corpus
    qids = [int(i * n_vec / n_queries) + 1 for i in range(n_queries)]
    qvecs = {
        r.vec_id: r.embedding
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    recalls: dict[str, list[float]] = {
        "lsh": [], "lsh_multiprobe": [], "lsh_multitable": [],
        "ivf": [], "pq": [], "ivfpq": [], "int8": [],
    }

    # int8 full-scan path: codes computed once (index-build analog)
    qz = vector_search.with_int8_codes(emb).select(
        "vec_id", "codes"
    ).localCheckpoint(eager=True)

    def _int8_codes_py(vec):
        mx = max(abs(float(x)) for x in vec)
        scale = mx / 127.0 if mx > 0 else 1.0
        import math
        return [
            int(min(127.0, max(-127.0, math.floor(float(x) / scale + 0.5))))
            for x in vec
        ]

    # IVF-PQ runs from the index layouts (it IS an index composite);
    # built ONCE on the full corpus — per-query the probe's own id is
    # dropped from the result instead of rebuilding the index
    import tempfile

    from cocoindex_data_ingestion_spark.operators import indexing

    idx = tempfile.mkdtemp(prefix="ann_recall_idx_")
    indexing.build_ivf_layout(
        emb, idx, stride=entrymod._IVF_STRIDE, assign="numpy"
    )
    indexing.build_pq_layout(
        emb, idx, m=entrymod._PQ_M, cb_k=entrymod._PQ_K,
        sub_d=entrymod._PQ_SUBD, encode="numpy",
    )
    indexing.build_ivfpq_codes(spark, idx)
    for qid, qvec in sorted(qvecs.items()):
        base = emb.filter(F.col("vec_id") != qid)
        qdf = spark.createDataFrame([(qvec,)], "qvec array<float>")
        qcol = F.array(*[F.lit(float(x)) for x in qvec]).cast("array<float>")

        exact = {
            r.vec_id
            for r in vector_search.knn(base, qcol, k=K).collect()
        }

        got_lsh = {
            r.vec_id
            for r in vector_search.knn_lsh(
                base, qcol, k=K, n_bits=entrymod._LSH_BITS
            ).collect()
        }
        got_lsh_mp = {
            r.vec_id
            for r in vector_search.knn_lsh(
                base, qcol, k=K, n_bits=entrymod._LSH_BITS,
                multiprobe=entrymod._LSH_MULTIPROBE,
            ).collect()
        }
        got_lsh_mt = {
            r.vec_id
            for r in vector_search.knn_lsh_multitable(
                base, qcol, k=K, n_bits=entrymod._LSH_BITS,
                n_tables=entrymod._LSH_TABLES,
            ).collect()
        }
        got_ivf = {
            r.vec_id
            for r in vector_search.ivf_knn(
                base, qdf, k=K, nprobe=entrymod._IVF_NPROBE,
                stride=entrymod._IVF_STRIDE,
            ).collect()
        }
        got_pq = {
            r.vec_id
            for r in vector_search.pq_knn(
                base, qdf, k=K, m=entrymod._PQ_M, cb_k=entrymod._PQ_K,
                sub_d=entrymod._PQ_SUBD, candidates=entrymod._PQ_CAND,
                dist_round=entrymod._PQ_DIST_ROUND,
            ).collect()
        }

        ivfpq_rows = indexing.indexed_knn_ivfpq(
            spark, idx, qdf.select(F.col("qvec")), k=K + 1,
            nprobe=entrymod._IVF_NPROBE, candidates=entrymod._IVFPQ_CAND,
            sub_d=entrymod._PQ_SUBD, dist_round=entrymod._PQ_DIST_ROUND,
        ).collect()
        got_ivfpq = set(
            [r.vec_id for r in ivfpq_rows if r.vec_id != qid][:K]
        )

        qc = _int8_codes_py(qvec)
        got_i8 = {
            r.vec_id
            for r in qz.filter(F.col("vec_id") != qid)
            .select(
                "vec_id",
                vector_search.int8_cosine(
                    F.col("codes"),
                    F.array(*[F.lit(c) for c in qc]).cast("array<long>"),
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(K)
            .collect()
        }

        for name, got in (
            ("lsh", got_lsh), ("lsh_multiprobe", got_lsh_mp),
            ("lsh_multitable", got_lsh_mt),
            ("ivf", got_ivf), ("pq", got_pq), ("ivfpq", got_ivfpq),
            ("int8", got_i8),
        ):
            recalls[name].append(len(got & exact) / len(exact))

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "sf": float(sf),
        "k": K,
        "n_queries": n_queries,
        "n_vectors": n_vec,
        "recall": {
            name: round(sum(v) / len(v), 4) for name, v in recalls.items()
        },
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
