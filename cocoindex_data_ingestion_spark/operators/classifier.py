"""Distributed multinomial Naive Bayes text classification.

The fastText-style corpus classifier used by large-scale pipelines
(CCNet/C4 quality filtering, language routing) reduced to its
Spark-native shape: training is two vocabulary-sized aggregations
over one pass of the token stream, the fitted model is a
``vocab x labels`` table small enough to broadcast, and inference is
a broadcast join + one per-(doc, label) aggregation.

Mirrors the reference's language/quality routing heuristics
(app/utils/entity_quality.py, app/flows/*_runner) with a trained
statistical model instead of hand rules.

Determinism contract: every log-likelihood is quantized to
fixed-point (``floor(x * 1e6 + 0.5) -> long``) *per model cell*, so
document scores are exact integer sums — order-independent across
partitionings and bit-identical to the DuckDB oracle. The argmax
tie-break is (score desc, label asc) via ``row_number``.

Scale notes (100 TB):
- the model is bounded by vocabulary x label count, not corpus size;
  ``max_vocab`` caps it explicitly (document-frequency top-k with a
  deterministic token tie-break) so the broadcast stays small.
- inference's only shuffle carries (doc, label) partial sums — the
  token stream itself is joined map-side against the broadcast model
  and combined before the exchange.
- the argmax window partitions by doc over exactly L rows per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.compare import stable_round
from ..functions.text import tokenize

LOG_SCALE = 1_000_000


def _quantize(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(float(LOG_SCALE)) + F.lit(0.5)).cast("long")


def nb_train(
    docs: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    max_vocab: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Fit a multinomial NB model over the token stream.

    Returns ``(model, priors)``:
    - ``model``: one row per (token, label) in the *dense* vocab x
      labels grid with Laplace-smoothed ``lq`` =
      ``quantize(ln((c + alpha) / (c_label + alpha * V)))``.
    - ``priors``: one row per label with ``prq`` =
      ``quantize(ln(n_label / n_docs))``.

    All counts are single-pass aggregates of the exploded token
    stream; `V` and per-label totals fold in as broadcast scalars, so
    no global windows appear anywhere in the plan.
    """
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("label"),
        F.explode(tokenize(text_col)).alias("token"),
    )
    # cnt feeds the vocab, the kept counts and the label list — three
    # legs; checkpoint so the token-stream aggregation runs once
    cnt = toks.groupBy("label", "token").agg(
        F.count("*").alias("c")
    ).localCheckpoint(eager=False)
    vocab = cnt.groupBy("token").agg(F.sum("c").alias("gc"))
    if max_vocab is not None:
        # k-bounded global ordering: plans as TakeOrderedAndProject,
        # no full sort materializes
        vocab = vocab.orderBy(F.desc("gc"), F.asc("token")).limit(max_vocab)
    # vocab feeds the size scalar, the kept filter and the grid
    vocab = vocab.select("token").localCheckpoint(eager=False)
    vsize = vocab.agg(F.count("*").alias("v"))
    labels = cnt.select("label").distinct()
    kept = cnt.join(vocab, "token")
    ctot = kept.groupBy("label").agg(F.sum("c").alias("ctot"))
    model = (
        vocab.crossJoin(labels)
        .join(kept, ["token", "label"], "left")
        .join(F.broadcast(ctot), "label")
        .crossJoin(F.broadcast(vsize))
        .select(
            "token",
            "label",
            _quantize(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (F.col("ctot").cast("double") + F.lit(alpha) * F.col("v"))
                )
            ).alias("lq"),
        )
    )
    ndocs = docs.agg(F.count("*").alias("tot"))
    priors = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("nl"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "label",
            _quantize(F.log(F.col("nl").cast("double") / F.col("tot"))).alias("prq"),
        )
    )
    return model, priors


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a fitted NB model; returns one row per
    doc: ``(id, pred, n_toks, score)`` where ``pred`` is the argmax
    label, ``n_toks`` counts in-vocabulary tokens, and ``score`` is
    the winning log-posterior rescaled to a double.

    Documents with zero in-vocabulary tokens are dropped (standard NB
    inference contract — no evidence, no prediction); left-join the
    result back to the corpus to route those to a fallback.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("token")
    )
    scored = (
        toks.join(F.broadcast(model), "token")
        .groupBy(id_col, "label")
        .agg(F.sum("lq").alias("sq"), F.count("*").alias("n_toks"))
        .join(F.broadcast(priors), "label")
        .withColumn("score_q", F.col("sq") + F.col("prq"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_q"), F.asc("label"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            id_col,
            F.col("label").alias("pred"),
            F.col("n_toks").cast("long").alias("n_toks"),
            stable_round(
                F.col("score_q").cast("double") / F.lit(float(LOG_SCALE)), 4
            ).alias("score"),
        )
    )


def classification_report(
    df: DataFrame,
    actual_col: str = "label",
    pred_col: str = "pred",
    round_to: int = 4,
) -> DataFrame:
    """Per-class evaluation of a prediction table: one row per actual
    class with support, predicted count, correct count, precision,
    recall and F1. Two class-bounded aggregates over one pass of the
    predictions; ratios of exact integer counts, so engine-exact
    after stable rounding."""
    from ..functions.compare import stable_round

    # both aggregates consume the prediction table — checkpoint so
    # the upstream inference pipeline runs once, not per leg
    df = df.localCheckpoint(eager=False)
    a, p = F.col(actual_col), F.col(pred_col)
    per_actual = df.groupBy(a.alias("label")).agg(
        F.count("*").cast("long").alias("n_actual"),
        F.sum((p == a).cast("long")).cast("long").alias("n_correct"),
    )
    per_pred = df.groupBy(p.alias("label")).agg(
        F.count("*").cast("long").alias("n_predicted")
    )
    j = per_actual.join(per_pred, "label", "left").fillna(
        {"n_predicted": 0}
    )
    prec = F.when(
        F.col("n_predicted") > 0, F.col("n_correct") / F.col("n_predicted")
    ).otherwise(F.lit(0.0))
    rec = F.col("n_correct") / F.col("n_actual")
    f1 = F.when(
        (F.col("n_correct") > 0),
        2.0 * (F.col("n_correct") / F.col("n_predicted"))
        * (F.col("n_correct") / F.col("n_actual"))
        / (F.col("n_correct") / F.col("n_predicted")
           + F.col("n_correct") / F.col("n_actual")),
    ).otherwise(F.lit(0.0))
    return j.select(
        "label",
        "n_actual",
        "n_predicted",
        "n_correct",
        stable_round(prec, round_to).alias("precision"),
        stable_round(rec, round_to).alias("recall"),
        stable_round(f1, round_to).alias("f1"),
    )
