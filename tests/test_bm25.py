"""BM25 formula vs hand-computed values + salting equivalence (SURVEY.md §5)."""

from __future__ import annotations

import math

from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.operators.bm25 import bm25_topk, query_terms
from dp_search_data_importer_spark.operators.postings import (
    corpus_stats,
    doc_freqs,
    term_freqs_sql,
)

CFG = EngineConfig()

DOCS = [
    (1, "spark index build fast fast"),
    (2, "spark query engine"),
    (3, "index merge merge merge sort"),
    (4, "unrelated words entirely here"),
]


def _py_bm25(docs: list[tuple[int, str]], query: str, k1=1.2, b=0.75):
    """30-line pure-Python exact scorer (SURVEY.md §7 step 1 oracle)."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs: dict[str, int] = {}
    for terms in toks.values():
        for t in set(terms):
            dfs[t] = dfs.get(t, 0) + 1
    scores: dict[int, float] = {}
    for term in dict.fromkeys(query.split()):  # distinct, ordered
        if term not in dfs:
            continue
        idf = math.log(1 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
        for d, terms in toks.items():
            tf = terms.count(term)
            if tf == 0:
                continue
            dl = len(terms)
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + s
    return sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))


def _spark_topk(spark, query: str, k: int = 10):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tf = term_freqs_sql(docs)
    queries = spark.createDataFrame([(1, query)], "query_id long, query_text string")
    rows = bm25_topk(tf, queries, CFG, k).collect()
    return sorted(
        [(r["doc_id"], r["score"]) for r in rows], key=lambda kv: (-kv[1], kv[0])
    )


def test_bm25_matches_pure_python_oracle(spark):
    for q in ["spark", "index merge", "fast query sort", "absent"]:
        expected = _py_bm25(DOCS, q)
        got = _spark_topk(spark, q)
        assert len(got) == len(expected), q
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gd == ed, q
            assert abs(gs - es) < 1e-4, (q, gd, gs, es)


def test_bm25_unseen_term_empty(spark):
    assert _spark_topk(spark, "zzznope") == []


def test_bm25_repeated_query_terms_counted_once(spark):
    assert _spark_topk(spark, "spark spark spark") == _spark_topk(spark, "spark")


def test_salted_df_equals_unsalted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tf = term_freqs_sql(docs)
    a = doc_freqs(tf, CFG, salted=False)
    b = doc_freqs(tf, CFG, salted=True)
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_corpus_stats_exact(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    tf = term_freqs_sql(docs)
    row = corpus_stats(tf).collect()[0]
    assert row["n_docs"] == 4
    assert abs(row["avgdl"] - (5 + 3 + 5 + 4) / 4) < 1e-12


def test_query_terms_distinct(spark):
    q = spark.createDataFrame(
        [(1, "Sort SORT sort!")], "query_id long, query_text string"
    )
    assert [tuple(r) for r in query_terms(q).collect()] == [(1, "sort")]
