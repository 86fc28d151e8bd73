"""Distributed trainable quality classifier — logistic regression over
feature-hashed text, trained entirely in DataFrame operations.

The fastText/CCNet-style curation step the pipeline was still missing: the
existing screens (``textstats.quality_signals``, ``lm_perplexity``) are
FIXED heuristics; real pretraining pipelines (CCNet, Brown et al. 2020 §A;
Touvron et al. 2023) additionally train a linear classifier on hashed
bag-of-words features against a labelled seed set (e.g. "looks like
Wikipedia") and keep-pass on its probability. This module is that trainer,
built Spark-first:

- Features are :func:`textstats.hashed_tfidf_sparse` rows
  ``(doc_id, bucket, value)`` — the hashing trick, no vocabulary table.
- The weight VECTOR is a DataFrame ``(bucket, w)``, never a driver-side
  array: at dim = 2^24 on a real corpus the model stays distributed, and
  each full-batch gradient-descent iteration is two hash-partitioned joins
  + two hash aggs (margins per doc, gradient per bucket). The driver holds
  only the loop counter — no collect of features, gradients, or weights.
- Each iteration's weights frame is pinned with an eager
  ``localCheckpoint``: lineage stays O(1) across iterations (no
  exponentially nested plan), and a materialized iterate is never
  recomputed under a drifted shuffle sample (the
  ``global_exclusive_cumsum`` lesson — see BENCH/ANALYSIS.md round 5).

Scale shape per iteration (I iterations, F feature rows, D dim):
one shuffle of F rows on ``bucket`` (margin join; broadcast when the dim
is provably small), one hash agg to doc margins, one broadcast-or-shuffle
join to labels, one hash agg of F rows back to D gradient rows, one
D-row join for the update. Nothing accumulates on the driver.

Reference parity: the reference pipeline (dp-search-data-importer) ships
documents to Elasticsearch and has no learned curation; this operator is
part of the Table-C LLM-pipeline surface (SURVEY.md "beyond the
reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: buckets at or below this count get a broadcast hint on the margin join
#: (same gate pattern as plans/query.py::filtered_topk); above it the join
#: shuffles on ``bucket`` and AQE plans it.
BROADCAST_DIM_LIMIT = 2_000_000

INTERCEPT_BUCKET = -1


def _with_intercept(features: DataFrame, docs_ids: DataFrame) -> DataFrame:
    bias = docs_ids.select(
        "doc_id",
        F.lit(INTERCEPT_BUCKET).cast("long").alias("bucket"),
        F.lit(1.0).alias("value"),
    )
    return features.select(
        "doc_id", F.col("bucket").cast("long").alias("bucket"),
        F.col("value").cast("double").alias("value"),
    ).unionByName(bias)


def fit_logreg(features: DataFrame, labels: DataFrame, *,
               iters: int = 20, lr: float = 0.5, l2: float = 0.0,
               dim: int | None = None,
               broadcast_limit: int = BROADCAST_DIM_LIMIT) -> DataFrame:
    """Full-batch gradient descent for L2-regularized logistic regression.

    ``features``: sparse ``(doc_id, bucket, value)`` rows (e.g.
    ``hashed_tfidf_sparse`` output). ``labels``: ``(doc_id, label)`` with
    label in {0, 1}; only labelled docs train (inner join — the unlabelled
    corpus is scored later with :func:`predict_logreg`). An intercept is
    modelled as the constant feature ``bucket = -1``.

    Returns the fitted weights frame ``(bucket, w)`` — one row per feature
    bucket observed in the training set plus the intercept. The update is

        w ← w − lr · ( Xᵀ(σ(Xw) − y) / n + l2 · w )

    with the intercept excluded from the L2 term, matching the textbook
    estimator (Hastie et al., ESL §4.4) and the numpy reference in
    tests/test_classifier.py.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    lab = labels.select(
        "doc_id", F.col("label").cast("double").alias("label"))
    x = _with_intercept(features, lab.select("doc_id"))
    # train on labelled docs only; pin the design matrix once — every
    # iteration reuses the same materialized rows instead of re-running
    # the upstream tokenize/hash lineage I times.
    x = x.join(lab.select("doc_id"), "doc_id").localCheckpoint(eager=True)
    n = x.select("doc_id").distinct().count()
    if n == 0:
        raise ValueError("no labelled documents to train on")

    small_dim = dim is not None and dim + 1 <= broadcast_limit
    w = x.select("bucket").distinct().select(
        "bucket", F.lit(0.0).alias("w"))
    w = w.localCheckpoint(eager=True)

    for _ in range(iters):
        w_side = F.broadcast(w) if small_dim else w
        margins = (x.join(w_side, "bucket")
                   .groupBy("doc_id")
                   .agg(F.sum(F.col("value") * F.col("w")).alias("z")))
        resid = (margins.join(lab, "doc_id")
                 .select("doc_id",
                         (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
                          - F.col("label")).alias("g")))
        grad = (x.join(resid, "doc_id")
                .groupBy("bucket")
                .agg((F.sum(F.col("value") * F.col("g"))
                      / F.lit(float(n))).alias("grad")))
        reg = F.when(F.col("bucket") == INTERCEPT_BUCKET, F.lit(0.0)) \
               .otherwise(F.lit(float(l2)) * F.col("w"))
        w = (w.join(grad, "bucket", "left")
             .select("bucket",
                     (F.col("w") - F.lit(float(lr))
                      * (F.coalesce(F.col("grad"), F.lit(0.0)) + reg))
                     .alias("w")))
        # eager pin: O(1) lineage, and the iterate is never recomputed
        w = w.localCheckpoint(eager=True)
    return w


def predict_logreg(features: DataFrame, weights: DataFrame, *,
                   dim: int | None = None,
                   broadcast_limit: int = BROADCAST_DIM_LIMIT,
                   threshold: float = 0.5,
                   all_ids: DataFrame | None = None) -> DataFrame:
    """Score docs with a fitted weights frame → (doc_id, prob, pred).

    Buckets unseen in training contribute 0 (left join), exactly as a
    hashed linear model behaves on out-of-vocabulary features. One join +
    one hash agg — the keep-pass over 100 TB is a single pass.

    ``all_ids`` (optional, one ``doc_id`` column): the full id universe
    to score. Docs with ZERO feature rows (empty text hashes to nothing)
    would otherwise vanish from the output; with ``all_ids`` they get
    the intercept-only score, so the keep-pass covers every doc.
    """
    ids = all_ids.select("doc_id").distinct() if all_ids is not None \
        else features.select("doc_id").distinct()
    if all_ids is not None:
        # the output universe is exactly ``all_ids``: feature rows for
        # docs outside it would survive the union/groupBy without an
        # intercept row and receive a silently wrong probability —
        # exclude them up front
        features = features.join(ids, "doc_id", "left_semi")
    x = _with_intercept(features, ids)
    small_dim = dim is not None and dim + 1 <= broadcast_limit
    w_side = F.broadcast(weights) if small_dim else weights
    z = (x.join(w_side, "bucket", "left")
         .groupBy("doc_id")
         .agg(F.sum(F.col("value") * F.coalesce(F.col("w"), F.lit(0.0)))
              .alias("z")))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return z.select(
        "doc_id", prob.alias("prob"),
        (prob >= F.lit(float(threshold))).cast("int").alias("pred"))


def train_quality_classifier(docs: DataFrame, seed_labels: DataFrame, *,
                             dim: int = 4096, iters: int = 20,
                             lr: float = 0.5, l2: float = 1e-4,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """End-to-end CCNet-style learned screen: hash-featurize the corpus,
    fit on the labelled seed set, score EVERY doc. Returns
    (doc_id, prob, pred) for the full corpus — the keep-pass column.

    ``seed_labels``: (doc_id, label) for the seed subset (label 1 =
    high-quality exemplar). Featurization runs once and serves both the
    training join and the corpus-wide scoring pass.
    """
    from dp_search_data_importer_spark.operators.textstats import (
        hashed_tfidf_sparse,
    )

    feats = hashed_tfidf_sparse(docs, dim, text_col=text_col,
                                id_col=id_col)
    w = fit_logreg(feats, seed_labels, iters=iters, lr=lr, l2=l2, dim=dim)
    return predict_logreg(
        feats, w, dim=dim,
        all_ids=docs.select(F.col(id_col).alias("doc_id")))
