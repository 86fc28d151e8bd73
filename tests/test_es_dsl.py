"""ES ``_search`` body planner tests: every compiled body must equal the
direct operator composition it routes to (rank + rounded score), plus
semantics checks for the filter/scoring context split and error paths."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dp_search_data_importer_spark.plans.es_dsl import (
    EsDslError,
    EsSearchPlanner,
)


@pytest.fixture(scope="module")
def planner(spark, sf_dir):
    from dp_search_data_importer_spark.plans.driver_queries import load_table

    docs = load_table(spark, sf_dir, "documents").cache()
    docs.count()
    return EsSearchPlanner(spark, docs)


def _ranked(df):
    rows = df.collect()
    return sorted(((r["doc_id"], round(r["score"], 4)) for r in rows),
                  key=lambda t: (-t[1], t[0]))


def test_match_equals_bm25_topk(spark, planner):
    from dp_search_data_importer_spark.operators import bm25 as bm25_ops
    from dp_search_data_importer_spark.operators import postings as po
    from dp_search_data_importer_spark.session import local_df

    body = {"query": {"match": {"text": "hash join"}}, "size": 10}
    got = _ranked(planner.search(body).hits)

    docs = planner.docs
    tf = po.term_freqs_sql(docs, id_col="doc_id", text_col="text")
    qdf = local_df(spark, [(1, "hash join")],
                   "query_id long, query_text string")
    exp = _ranked(
        bm25_ops.bm25_topk(tf, qdf, k=10,
                           stats=po.corpus_stats_from_docs(docs))
        .drop("query_id"))
    assert got == exp


def test_bool_filter_context_does_not_score(planner):
    """bool{must: match, filter: range} ≡ match hits ∩ range set with
    UNCHANGED scores (global statistics — the ES filter contract)."""
    plain = dict(_ranked(planner.search(
        {"query": {"match": {"text": "hash join"}}, "size": 10000}).hits))
    body = {"query": {"bool": {
        "must": [{"match": {"text": "hash join"}}],
        "filter": [{"range": {"n_chars": {"gte": 300, "lte": 1500}}}],
    }}, "size": 10000}
    filtered = _ranked(planner.search(body).hits)
    allowed = {r["doc_id"] for r in planner.docs.filter(
        "n_chars >= 300 and n_chars <= 1500").select("doc_id").collect()}
    assert filtered  # non-trivial
    for doc_id, score in filtered:
        assert doc_id in allowed
        assert plain[doc_id] == score


def test_bool_msm_default_rules(planner):
    # should-only: msm defaults to 1 → docs must match ≥1 should clause
    only_should = planner.search({"query": {"bool": {
        "should": [{"match": {"text": "zzznope"}}]}}, "size": 5}).hits
    assert only_should.count() == 0
    # should + filter: msm defaults to 0 → should becomes pure boost
    with_filter = planner.search({"query": {"bool": {
        "should": [{"match": {"text": "zzznope"}}],
        "filter": [{"range": {"n_chars": {"lte": 400}}}]}},
        "size": 10000}).hits
    n_small = planner.docs.filter("n_chars <= 400").count()
    assert with_filter.count() == n_small


def test_must_not_excludes(planner):
    body = {"query": {"bool": {
        "must": [{"match": {"text": "hash"}}],
        "must_not": [{"term": {"text": "join"}}]}}, "size": 10000}
    hits = {d for d, _ in _ranked(planner.search(body).hits)}
    with_join = {r["doc_id"] for r in planner.tf("text")
                 .filter("term = 'join'").select("doc_id").collect()}
    assert hits and not (hits & with_join)


def test_constant_score_and_terms(planner):
    body = {"query": {"constant_score": {
        "filter": {"terms": {"lang": ["en", "fr"]}}, "boost": 1.7}},
        "size": 100000}
    rows = planner.search(body).hits.collect()
    n = planner.docs.filter(F.col("lang").isin(["en", "fr"])).count()
    assert len(rows) == n
    assert all(r["score"] == pytest.approx(1.7) for r in rows)


def test_dis_max_matches_operator(spark, planner):
    from dp_search_data_importer_spark.operators.bm25 import (
        dis_max_scores,
        topk,
    )

    body = {"query": {"dis_max": {
        "tie_breaker": 0.3,
        "queries": [{"match": {"text": "hash join"}},
                    {"match_phrase": {"text": "hash join"}}]}},
        "size": 10}
    got = _ranked(planner.search(body).hits)
    b1 = planner.score({"match": {"text": "hash join"}}).withColumn(
        "query_id", F.lit(0))
    b2 = planner.score({"match_phrase": {"text": "hash join"}}).withColumn(
        "query_id", F.lit(0))
    exp = _ranked(topk(dis_max_scores([b1, b2], 0.3), 10).drop("query_id"))
    assert got == exp


def test_function_score_log1p(planner):
    body = {"query": {"function_score": {
        "query": {"match": {"text": "hash join"}},
        "field_value_factor": {"field": "n_chars", "factor": 0.1,
                               "modifier": "log1p"},
        "boost_mode": "multiply"}}, "size": 10}
    got = dict(_ranked(planner.search(body).hits))
    base = {r["doc_id"]: r["score"]
            for r in planner.score({"match": {"text": "hash join"}})
            .collect()}
    meta = {r["doc_id"]: r["n_chars"]
            for r in planner.docs.select("doc_id", "n_chars").collect()}
    import math

    for doc_id, score in got.items():
        exp = base[doc_id] * (1.0 + math.log1p(0.1 * meta[doc_id]))
        assert score == pytest.approx(round(exp, 4), abs=2e-4)


def test_sort_and_search_after(planner):
    body = {"query": {"match": {"text": "hash"}},
            "sort": [{"n_chars": {"order": "desc"}}], "size": 5}
    p1 = planner.search(body).hits.collect()
    assert len(p1) == 5
    vals = [(r["n_chars"], -r["doc_id"]) for r in p1]
    assert vals == sorted(vals, reverse=True)
    last = p1[-1] if vals[-1] == min(vals) else \
        sorted(p1, key=lambda r: (-r["n_chars"], r["doc_id"]))[-1]
    body2 = dict(body, search_after=[last["n_chars"], last["doc_id"]])
    p2 = planner.search(body2).hits.collect()
    assert len(p2) == 5
    full = planner.search(dict(body, size=10)).hits.collect()
    exp = sorted(full, key=lambda r: (-r["n_chars"], r["doc_id"]))[5:10]
    assert sorted((r["doc_id"] for r in p2)) == sorted(
        r["doc_id"] for r in exp)


def test_rescore_matches_operator(planner):
    from dp_search_data_importer_spark.operators.bm25 import rescore_topk

    body = {"query": {"match": {"text": "hash join"}},
            "rescore": {"window_size": 20, "query": {
                "rescore_query": {"match_phrase": {"text": "hash join"}},
                "query_weight": 1.0, "rescore_query_weight": 2.0}},
            "size": 10}
    got = _ranked(planner.search(body).hits)
    base = planner.score({"match": {"text": "hash join"}}).withColumn(
        "query_id", F.lit(0).cast("long"))
    resc = planner.score({"match_phrase": {"text": "hash join"}}).withColumn(
        "query_id", F.lit(0).cast("long"))
    exp = _ranked(rescore_topk(base, resc, 20, 10, 1.0, 2.0)
                  .drop("query_id"))
    assert got == exp


def test_collapse_one_hit_per_key(planner):
    body = {"query": {"match": {"text": "hash join"}},
            "collapse": {"field": "lang"}, "size": 10}
    rows = planner.search(body).hits.collect()
    langs = [r["lang"] for r in rows]
    assert len(langs) == len(set(langs))
    assert rows  # collapse produced winners


def test_aggs_terms_range_cardinality_percentiles(planner):
    body = {"query": {"match": {"text": "hash join"}}, "size": 0,
            "aggs": {
                "langs": {"terms": {"field": "lang", "size": 3}},
                "buckets": {"range": {"field": "n_chars", "ranges": [
                    {"to": 500.0}, {"from": 500.0}]}},
                "nlang": {"cardinality": {"field": "lang"}},
                "pct": {"percentiles": {"field": "n_chars",
                                        "percents": [50.0]}},
                "st": {"stats": {"field": "n_chars"}},
            }}
    res = planner.search(body)
    hit_ids = {r["doc_id"] for r in planner.score(
        {"match": {"text": "hash join"}}).select("doc_id").collect()}
    langs = res.aggregations["langs"].collect()
    assert sum(r["doc_count"] for r in langs) <= len(hit_ids)
    assert langs == sorted(langs,
                           key=lambda r: (-r["doc_count"], r["key"]))
    ranges = res.aggregations["buckets"].collect()
    assert sum(r["doc_count"] for r in ranges) == len(hit_ids)
    card = res.aggregations["nlang"].collect()[0]
    assert card["value"] == len({
        r["lang"] for r in planner.docs.filter(
            F.col("doc_id").isin(list(hit_ids)))
        .select("lang").collect()})
    st = res.aggregations["st"].collect()[0]
    assert st["count"] == len(hit_ids)
    assert res.aggregations["pct"].collect()[0]["percent"] == 50.0


def test_aggs_top_hits_and_composite(planner):
    from dp_search_data_importer_spark.operators import aggs as agg_ops

    body = {"query": {"match": {"text": "hash join"}}, "size": 0,
            "aggs": {"best": {"terms": {"field": "lang"},
                              "aggs": {"top": {"top_hits": {
                                  "size": 2,
                                  "sort": [{"n_chars": {
                                      "order": "desc"}}]}}}},
                     "page": {"composite": {
                         "size": 3,
                         "sources": [{"l": {"terms": {"field": "lang"}}}],
                     }}}}
    res = planner.search(body)
    th = res.aggregations["best"].collect()
    per_bucket: dict[str, int] = {}
    for r in th:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + 1
    assert per_bucket and all(v <= 2 for v in per_bucket.values())
    page1 = res.aggregations["page"].collect()
    assert len(page1) <= 3
    # after-cursor resumes exactly past page 1
    after = {"l": max(r["lang"] for r in page1)}
    body2 = {"query": {"match": {"text": "hash join"}}, "size": 0,
             "aggs": {"page": {"composite": {
                 "size": 100, "after": after,
                 "sources": [{"l": {"terms": {"field": "lang"}}}]}}}}
    page2 = planner.search(body2).aggregations["page"].collect()
    assert all(r["lang"] > after["l"] for r in page2)


def test_expansion_families_and_phrase_prefix(planner):
    # wildcard / prefix / fuzzy / regexp compile to scored OR-sets
    for q in ({"wildcard": {"text": {"value": "wind*"}}},
              {"prefix": {"text": {"value": "ha"}}},
              {"fuzzy": {"text": {"value": "hashh"}}},
              {"regexp": {"text": {"value": "jo.n|join"}}}):
        assert planner.search({"query": q, "size": 5}).hits.count() > 0
    pp = planner.search({"query": {
        "match_phrase_prefix": {"text": {"query": "hash jo"}}},
        "size": 5}).hits
    assert pp.count() > 0


def test_highlight_hit_scoped_snippets(planner):
    body = {"query": {"match": {"text": "hash join"}}, "size": 10,
            "highlight": {"fields": {"text": {}}}}
    res = planner.search(body)
    hit_ids = {r["doc_id"] for r in res.hits.collect()}
    hl = res.highlights.collect()
    assert hl
    for r in hl:
        assert r["doc_id"] in hit_ids          # hit-scoped only
        assert r["term"] in ("hash", "join")   # scoring terms only
        assert r["term"] in r["snippet"].split()
        assert r["field"] == "text"
    # filter-context terms are never highlighted
    body2 = {"query": {"bool": {
        "must": [{"match": {"text": "hash"}}],
        "filter": [{"term": {"text": "join"}}]}},
        "size": 10, "highlight": {"fields": {"text": {}}}}
    assert all(r["term"] == "hash"
               for r in planner.search(body2).highlights.collect())


def test_suggest_completion_and_term(planner):
    body = {"suggest": {
        "c": {"prefix": "ha", "completion": {"field": "text", "size": 5}},
        "t": {"text": "hassh", "term": {"field": "text", "size": 3}},
    }}
    res = planner.search(body)
    comp = res.suggestions["c"].collect()
    assert comp and all(r["term"].startswith("ha") for r in comp)
    dfs = [r["df"] for r in comp]
    assert dfs == sorted(dfs, reverse=True)
    term = res.suggestions["t"].collect()
    assert term and all(r["dist"] <= 2 for r in term)
    assert any(r["term"] == "hash" for r in term)
    # ranked (dist asc, df desc, term asc)
    keys = [(r["dist"], -r["df"], r["term"]) for r in term]
    assert keys == sorted(keys)


@pytest.fixture(scope="module")
def doc_index(spark, planner, tmp_path_factory):
    """Stored index built from the SAME documents table the dataflow
    planner reads — the cross-planner identity substrate."""
    from dp_search_data_importer_spark.config import EngineConfig
    from dp_search_data_importer_spark.plans.build_index import build_index

    out = str(tmp_path_factory.mktemp("dsl_idx"))
    build_index(spark, planner.docs, out,
                EngineConfig(n_shards=4, block_size=64),
                code_aware=False, text_col="text",
                already_normalized=True, waves=1)
    return out


def _indexed(spark, out, body, **kw):
    from dp_search_data_importer_spark.plans.es_dsl import search_indexed

    return search_indexed(spark, out, body, **kw)


def test_indexed_match_equals_dataflow(spark, planner, doc_index):
    body = {"query": {"match": {"text": "hash join"}}, "size": 10}
    got = _ranked(_indexed(spark, doc_index, body).hits)
    exp = _ranked(planner.search(body).hits)
    assert got == exp
    # WAND route: same ranking, exhaustive-scan-free
    wand = _ranked(_indexed(spark, doc_index, body, use_wand=True).hits)
    assert wand == exp


def test_indexed_bool_and_filtered_equal_dataflow(spark, planner,
                                                  doc_index):
    # single must-match + filter context → filtered_topk route
    body = {"query": {"bool": {
        "must": [{"match": {"text": "hash join"}}],
        "filter": [{"range": {"n_chars": {"gte": 300, "lte": 1500}}}],
    }}, "size": 10}
    assert _ranked(_indexed(spark, doc_index, body).hits) == \
        _ranked(planner.search(body).hits)
    # term-level clause set → bool_topk_indexed route
    body2 = {"query": {"bool": {
        "must": [{"match": {"text": "hash"}}],
        "should": [{"match": {"text": "merge"}},
                   {"match": {"text": "join"}}],
        "must_not": [{"match": {"text": "zzznope"}}],
    }}, "size": 10}
    assert _ranked(_indexed(spark, doc_index, body2).hits) == \
        _ranked(planner.search(body2).hits)


def test_indexed_sort_and_facets_equal_dataflow(spark, planner,
                                                doc_index):
    body = {"query": {"match": {"text": "hash"}},
            "sort": [{"n_chars": {"order": "desc"}}], "size": 5}
    got = [(r["doc_id"], r["n_chars"])
           for r in _indexed(spark, doc_index, body).hits
           .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
           .collect()]
    exp = [(r["doc_id"], r["n_chars"])
           for r in planner.search(body).hits
           .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
           .collect()]
    assert got == exp
    body_a = {"query": {"match": {"text": "hash"}}, "size": 0,
              "aggs": {"langs": {"terms": {"field": "lang", "size": 4}}}}
    got_a = sorted((r["key"], r["doc_count"]) for r in
                   _indexed(spark, doc_index, body_a)
                   .aggregations["langs"].collect())
    exp_a = sorted((r["key"], r["doc_count"]) for r in
                   planner.search(body_a).aggregations["langs"].collect())
    assert got_a == exp_a


def test_indexed_errors(spark, doc_index):
    from dp_search_data_importer_spark.plans.es_dsl import (
        EsDslError,
        search_indexed,
    )

    with pytest.raises(EsDslError):
        search_indexed(spark, doc_index,
                       {"query": {"match_phrase": {"text": "a b"}}})
    with pytest.raises(EsDslError):
        search_indexed(spark, doc_index,
                       {"query": {"bool": {"must": [
                           {"match": {"text": "two tokens"}},
                           {"match": {"text": "x"}}]}}})


def test_errors(planner):
    with pytest.raises(EsDslError):
        planner.search({"query": {"nested": {"path": "dims"}}})
    with pytest.raises(EsDslError):
        planner.search({"query": {"match_all": {}}, "from": 10})
    with pytest.raises(EsDslError):
        planner.search({"knn": {}})
    with pytest.raises(EsDslError):
        planner.search({"query": {"bool": {}}})
