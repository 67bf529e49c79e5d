"""ANN quality probe: recall@k of every approximate path vs exact,
plus a probe-parameter auto-tuner (r4 judge directive #7).

For Q sampled query vectors, run the same operator code the
registered queries use (``knn_lsh``, ``ivf_knn``, ``pq_knn`` with the
production parameters from ``__spark_entry__``) and score each
method's top-k id set against exact brute-force ``knn``.

This is measurement tooling, not a serving path, so a driver-side
loop over Q queries is acceptable: each iteration is one distributed
top-k job, and the loop exists only to produce the recall table
recorded in SCALING.md.

Tuning (``--tune``): sweep (ivf nprobe, lsh multiprobe, lsh tables)
upward from the production values and recommend, per knob, the
CHEAPEST setting whose measured recall@10 meets the target — subject
to a measured-wall-clock cost cap (default 2× the production
setting). ``--write-defaults`` persists the recommendation to
``tools/ann_defaults.json``, which ``__spark_entry__`` reads at
import so the registered ``vector_knn_ivf``/``_lsh*`` queries (and
their DuckDB oracles, built from the same constants) consume it.
``--fixture clustered`` swaps the (isotropic) driver embeddings for a
deterministic blobbed corpus of the same size/dim — the regime real
embedding corpora live in — so defaults are not fit to isotropic
noise.

Usage: python tools/ann_recall.py [sf_dir] [n_queries]
           [--tune] [--write-defaults] [--fixture clustered]
Prints one JSON line: {"sf": ..., "k": 10, "n_queries": Q,
                       "recall": {"lsh": r, "ivf": r, "pq": r},
                       "recommended": {...}}  (with --tune)
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

DEFAULTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "ann_defaults.json"
)


def make_clustered_embeddings(spark, n: int, dim: int, n_blobs: int = 16,
                              spread: float = 0.08, seed: int = 13):
    """Deterministic blobbed corpus of the same (n, dim) as the
    driver embeddings — unit-norm blob centers, gaussian spread.
    The regime IVF/LSH exist for (real embedding corpora cluster by
    construction; the driver's synthetic vectors are isotropic)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.uniform(-1, 1, size=(n_blobs, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(n) % n_blobs] + spread * rng.randn(n, dim)
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(pts)],
        "vec_id long, embedding array<float>",
    )


def tune(spark, emb, qvecs: dict, base: dict, recall_target: float = 0.5,
         cost_cap: float = 2.0, floors: dict | None = None) -> dict:
    """Per-knob sweep: measure (recall@K, wall sec) for increasing
    probe budgets; recommend the cheapest setting meeting the target,
    never exceeding ``cost_cap`` × the production setting's wall.

    ``floors`` defaults to the HARDCODED production constants
    (``__spark_entry__._ANN_FALLBACKS``), not the file-derived module
    values — flooring at module values is circular: once
    ann_defaults.json holds a sub-production value, every later tune
    would ratchet downward from it (r5 advisor finding)."""
    import time

    from pyspark.sql import functions as F

    from cocoindex_data_ingestion_spark.operators import vector_search

    exact_sets = {}
    for qid, qvec in qvecs.items():
        qcol = F.array(*[F.lit(float(x)) for x in qvec]).cast("array<float>")
        exact_sets[qid] = {
            r.vec_id for r in vector_search.knn(
                emb.filter(F.col("vec_id") != qid), qcol, k=K
            ).collect()
        }

    def measure(run) -> tuple[float, float]:
        rec, t0 = [], time.time()
        for qid, qvec in qvecs.items():
            got = run(qid, qvec)
            rec.append(len(got & exact_sets[qid]) / K)
        return sum(rec) / len(rec), time.time() - t0

    report: dict[str, dict] = {"sweeps": {}, "recommended": dict(base)}

    floors = dict(floors or {})

    def sweep(knob: str, values: list, run_factory) -> None:
        rows = []
        base_wall = None
        for v in values:
            r, w = measure(run_factory(v))
            if v == base[knob]:
                base_wall = w
            rows.append({"value": v, "recall": round(r, 4),
                         "wall_sec": round(w, 2)})
        base_wall = base_wall or rows[0]["wall_sec"]
        # recommendation floor = the hardcoded production value:
        # tuning exists to FIX under-probing, never to shave margin
        # below the long-standing default (sub-floor sweep rows stay
        # in the report as context)
        floor = max(base[knob], floors.get(knob, base[knob]))
        chosen = floor
        eligible = [r for r in rows if r["value"] >= floor]
        for row in eligible:  # cheapest (ascending) value meeting target
            if (row["recall"] >= recall_target
                    and row["wall_sec"] <= cost_cap * base_wall):
                chosen = row["value"]
                break
        else:
            best = max(
                (r for r in eligible
                 if r["wall_sec"] <= cost_cap * base_wall),
                key=lambda r: r["recall"],
                default=None,
            )
            if best is not None:
                chosen = best["value"]
        report["sweeps"][knob] = rows
        report["recommended"][knob] = chosen

    sweep(
        "ivf_nprobe",
        sorted({base["ivf_nprobe"], 2, 3, 4, 6}),
        lambda np_: lambda qid, qvec: {
            r.vec_id for r in vector_search.ivf_knn(
                emb.filter(F.col("vec_id") != qid),
                spark.createDataFrame([(qvec,)], "qvec array<float>"),
                k=K, nprobe=np_, stride=base["ivf_stride"],
            ).collect()
        },
    )
    sweep(
        "lsh_multiprobe",
        sorted({base["lsh_multiprobe"], 0, 1, 2}),
        lambda mp: lambda qid, qvec: {
            r.vec_id for r in vector_search.knn_lsh(
                emb.filter(F.col("vec_id") != qid),
                F.array(*[F.lit(float(x)) for x in qvec]).cast("array<float>"),
                k=K, n_bits=base["lsh_bits"], multiprobe=mp,
            ).collect()
        },
    )
    sweep(
        "lsh_tables",
        sorted({base["lsh_tables"], 2, 3, 4}),
        lambda nt: lambda qid, qvec: {
            r.vec_id for r in vector_search.knn_lsh_multitable(
                emb.filter(F.col("vec_id") != qid),
                F.array(*[F.lit(float(x)) for x in qvec]).cast("array<float>"),
                k=K, n_bits=base["lsh_bits"], n_tables=nt,
            ).collect()
        },
    )
    return report


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("n_queries", nargs="?", type=int, default=16)
    ap.add_argument("--tune", action="store_true")
    ap.add_argument("--write-defaults", action="store_true")
    ap.add_argument("--fixture", choices=["driver", "clustered"],
                    default="driver")
    ns = ap.parse_args()
    fixture = ns.fixture
    sf_dir = ns.sf_dir
    n_queries = ns.n_queries

    spark = get_spark("ann_recall")
    emb = load_table(spark, "embeddings", sf_dir)
    if fixture == "clustered":
        n = emb.count()
        dim = len(emb.select("embedding").first()[0])
        emb = make_clustered_embeddings(spark, n, dim)
    emb = emb.cache()
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
        "fixture": fixture,
        "recall": {
            name: round(sum(v) / len(v), 4) for name, v in recalls.items()
        },
    }

    if ns.tune:
        base = {
            "ivf_nprobe": entrymod._IVF_NPROBE,
            "ivf_stride": entrymod._IVF_STRIDE,
            "lsh_bits": entrymod._LSH_BITS,
            "lsh_multiprobe": entrymod._LSH_MULTIPROBE,
            "lsh_tables": entrymod._LSH_TABLES,
        }
        report = tune(spark, emb, qvecs, base,
                      floors=entrymod._ANN_FALLBACKS)
        out["sweeps"] = report["sweeps"]
        out["recommended"] = report["recommended"]
        if ns.write_defaults:
            rec = dict(report["recommended"])
            rec["tuned_on"] = {
                "fixture": fixture, "sf": out["sf"], "n_vectors": n_vec,
            }
            with open(DEFAULTS_PATH, "w") as f:
                json.dump(rec, f, indent=1)
            out["defaults_written"] = DEFAULTS_PATH

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
