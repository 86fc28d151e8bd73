"""Exact BM25 scoring + top-k (SURVEY.md §2 B4/B5) — pure Catalyst.

The reference delegates scoring to Elasticsearch 7.10's Lucene
``BM25Similarity`` (``/root/reference/README.md:18``, ``go.mod:15``); defaults
k1=1.2, b=0.75:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

This exact path is the engine's permanent correctness oracle (the block-max
WAND fast path in ``operators/wand.py`` must be rank-identical to it). It is
deliberately 100% Catalyst expressions — broadcast joins + whole-stage-codegen
arithmetic, zero Python on the data path.

Physical plan at scale (what ``.explain`` should show):
- query term set is tiny → ``F.broadcast`` both the terms and their df rows:
  postings side never shuffles for the join (BroadcastHashJoin).
- doc lengths ride inside the postings tuples (see ``operators/postings.py``)
  → no join against the docs table at query time.
- per-(query,doc) score sum is the only shuffle, over candidate docs only.
- top-k uses rounded-score ordering with doc_id tie-break: deterministic
  across engines and float-summation orders (SURVEY.md §7 hard part a).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.functions.tokenize import tokenize_expr


def bm25_term_score(tf: Column, dl: Column, df: Column, n_docs: Column,
                    avgdl: Column, cfg: EngineConfig) -> Column:
    """Per-(term, doc) BM25 contribution as a Catalyst expression."""
    idf = F.log(
        F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    )
    tf_d = tf.cast("double")
    norm = tf_d + F.lit(cfg.k1) * (
        F.lit(1.0 - cfg.b) + F.lit(cfg.b) * dl.cast("double") / avgdl
    )
    return idf * tf_d * F.lit(cfg.k1 + 1.0) / norm


def query_terms(queries: DataFrame, text_col: str = "query_text",
                code_aware: bool = False) -> DataFrame:
    """(query_id, term) — distinct query terms via the SAME analyzer as the
    index (analyzer symmetry, as ES enforces between index and search time:
    a code-aware index must code-tokenize queries or camelCase queries
    silently miss)."""
    from dp_search_data_importer_spark.functions.tokenize import tokenize_code_expr

    tok = tokenize_code_expr if code_aware else tokenize_expr
    return (
        queries.select("query_id", F.explode(tok(text_col)).alias("term"))
        .distinct()
    )


def bm25_scores(
    tf: DataFrame,
    qterms: DataFrame,
    dfs: DataFrame,
    stats: DataFrame,
    cfg: EngineConfig | None = None,
) -> DataFrame:
    """(query_id, doc_id, score) for every candidate doc.

    ``tf``: (doc_id, term, tf, dl); ``qterms``: (query_id, term);
    ``dfs``: (term, df); ``stats``: 1-row (n_docs, avgdl).
    """
    cfg = cfg or EngineConfig()
    qdf = qterms.join(dfs, "term", "inner")  # unseen query terms drop out here
    cand = tf.join(F.broadcast(qdf), "term", "inner")
    cand = cand.join(F.broadcast(stats))  # 1-row cross join, broadcast
    scored = cand.withColumn(
        "term_score",
        bm25_term_score(F.col("tf"), F.col("dl"), F.col("df"),
                        F.col("n_docs"), F.col("avgdl"), cfg),
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )


def topk(scores: DataFrame, k: int, round_digits: int = 4) -> DataFrame:
    """Per-query top-k, deterministically ordered by (round(score) desc,
    doc_id asc). Rounding before ranking makes rank stable under float
    summation-order differences between engines/paths."""
    rounded = scores.withColumn("score", F.round(F.col("score"), round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        rounded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def bm25_topk(
    tf: DataFrame,
    queries: DataFrame,
    cfg: EngineConfig | None = None,
    k: int | None = None,
    code_aware: bool = False,
    stats: DataFrame | None = None,
) -> DataFrame:
    """End-to-end exact path: tf table + (query_id, query_text) → top-k.

    Computes df/stats from the tf table itself (one pass each; in the sharded
    production plan these come precomputed from the index manifest). Pass
    ``stats`` explicitly (e.g. ``corpus_stats_from_docs``) for
    Lucene-consistent N/avgdl on corpora containing zero-token docs.
    """
    from dp_search_data_importer_spark.operators.postings import (
        corpus_stats,
        doc_freqs,
    )

    cfg = cfg or EngineConfig()
    qt = query_terms(queries, code_aware=code_aware)
    dfs = doc_freqs(tf)
    stats = corpus_stats(tf) if stats is None else stats
    scores = bm25_scores(tf, qt, dfs, stats, cfg)
    return topk(scores, k or cfg.k)


def multi_match_topk(
    docs: DataFrame,
    field_boosts: dict[str, float],
    queries: DataFrame,
    cfg: EngineConfig | None = None,
    k: int | None = None,
    code_aware: bool = False,
) -> DataFrame:
    """ES ``multi_match`` (``most_fields``) twin — the reference's ES index
    holds multiple searchable fields per document (title, summary,
    keywords: ``/root/reference/models/elastic.go:4-28``), and multi-field
    scoring is bread-and-butter ES usage this engine must cover.

    Lucene ``most_fields`` semantics: each field is scored as an
    independent BM25 index (its OWN df, dl, avgdl — a term rare in titles
    but common in bodies gets a high title idf), and the document score is
    Σ_field boost_f · BM25_f. Pure Catalyst: per-field tf/df/stats reuse
    the existing building blocks, the per-field score frames union, and
    one (query, doc) hash agg sums them — fields are independent plan
    branches over the same scan, no extra shuffle beyond the final agg."""
    from dp_search_data_importer_spark.operators.postings import (
        corpus_stats_from_docs,
        doc_freqs,
        term_freqs_sql,
    )

    cfg = cfg or EngineConfig()
    qt = query_terms(queries, code_aware=code_aware)
    per_field = []
    for field, boost in field_boosts.items():
        tf = term_freqs_sql(docs, id_col="doc_id", text_col=field,
                            code_aware=code_aware)
        dfs = doc_freqs(tf)
        stats = corpus_stats_from_docs(docs, text_col=field,
                                       code_aware=code_aware)
        s = bm25_scores(tf, qt, dfs, stats, cfg).withColumn(
            "score", F.col("score") * F.lit(float(boost)))
        per_field.append(s)
    union = per_field[0]
    for s in per_field[1:]:
        union = union.unionByName(s)
    summed = union.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score"))
    return topk(summed, k or cfg.k)
