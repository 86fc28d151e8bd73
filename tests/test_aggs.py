"""Semantic tests for the ES aggregation family (operators/aggs.py) and
the dis_max / rescore / match_phrase_prefix query twins — the properties
the SQL oracle can't check: approx-path tolerance, cursor pruning ≡ full
enumeration, window-rescore boundary behavior, expansion caps."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dp_search_data_importer_spark.operators import aggs
from dp_search_data_importer_spark.operators.bm25 import (
    dis_max_scores,
    rescore_topk,
    topk,
)


@pytest.fixture(scope="module")
def hits_meta(spark):
    """Two queries over a 400-doc metadata table with a skewed bucket
    field (cat 'a' holds half the docs) — exercises the salted windows."""
    meta = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a")
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 7).cast("string")))
        .alias("cat"),
        (F.col("id") * 13 % 997).cast("long").alias("n"),
    ).cache()
    hits = spark.range(400).select(
        F.lit(1).cast("long").alias("query_id"),
        F.col("id").alias("doc_id"),
    ).union(
        spark.range(0, 400, 3).select(
            F.lit(2).cast("long").alias("query_id"),
            F.col("id").alias("doc_id"))
    ).cache()
    meta.count(), hits.count()
    return hits, meta


def test_range_agg_emits_empty_buckets_and_partitions(spark, hits_meta):
    hits, meta = hits_meta
    out = aggs.range_agg(hits, meta, "n",
                         [(None, 0.0), (0.0, 500.0), (500.0, None)])
    rows = {(r["query_id"], r["range_key"]): r["doc_count"]
            for r in out.collect()}
    # every declared range present for every query, including the
    # impossible (None, 0) bucket with count 0
    assert rows[(1, "*-0")] == 0 and rows[(2, "*-0")] == 0
    assert rows[(1, "0-500")] + rows[(1, "500-*")] == 400
    assert rows[(2, "0-500")] + rows[(2, "500-*")] == 134
    # half-open semantics: a value exactly at 'to' falls in the next bucket
    one = aggs.range_agg(
        hits.filter("query_id = 1"),
        meta.withColumn("n", F.lit(500).cast("long")), "n",
        [(0.0, 500.0), (500.0, None)]).collect()
    got = {r["range_key"]: r["doc_count"] for r in one}
    assert got["0-500"] == 0 and got["500-*"] == 400


def test_cardinality_exact_vs_hll(spark, hits_meta):
    hits, meta = hits_meta
    exact = {(r["query_id"], r["field"]): r["value"]
             for r in aggs.cardinality_agg(hits, meta, ["cat"]).collect()}
    approx = {(r["query_id"], r["field"]): r["value"]
              for r in aggs.cardinality_agg(hits, meta, ["cat"],
                                            approx=True).collect()}
    assert exact[(1, "cat")] == 8  # 'a' + c0..c6
    for k, v in exact.items():
        # HLL++ at rsd=0.023 on single-digit cardinalities is exact
        assert abs(approx[k] - v) <= max(1, int(0.05 * v))


def test_percentiles_match_numpy(spark, hits_meta):
    import numpy as np

    hits, meta = hits_meta
    out = aggs.percentiles_agg(hits, meta, "n", [50.0, 95.0])
    got = {(r["query_id"], r["percent"]): r["value"] for r in out.collect()}
    vals1 = np.array([i * 13 % 997 for i in range(400)], dtype=float)
    vals2 = np.array([i * 13 % 997 for i in range(0, 400, 3)], dtype=float)
    assert got[(1, 50.0)] == pytest.approx(
        np.percentile(vals1, 50), abs=1e-3)
    assert got[(2, 95.0)] == pytest.approx(
        np.percentile(vals2, 95), abs=1e-3)


def test_extended_stats_moments(spark, hits_meta):
    import numpy as np

    hits, meta = hits_meta
    row = (aggs.extended_stats_agg(hits, meta, "n")
           .filter("query_id = 1").collect()[0])
    vals = np.array([i * 13 % 997 for i in range(400)], dtype=float)
    assert row["doc_count"] == 400
    assert row["sum_v"] == int(vals.sum())
    assert row["variance"] == pytest.approx(vals.var(), abs=1e-3)
    assert row["std_deviation"] == pytest.approx(vals.std(), abs=1e-3)


def test_top_hits_per_bucket(spark, hits_meta):
    hits, meta = hits_meta
    out = aggs.top_hits_agg(hits, meta, "cat", "n", hits_per_bucket=2)
    rows = out.filter("query_id = 1").collect()
    by_bucket: dict[str, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert all(len(v) <= 2 for v in by_bucket.values())
    # the skewed 'a' bucket: top-2 by n desc among even doc_ids
    best = sorted(((i * 13 % 997, -i) for i in range(0, 400, 2)),
                  reverse=True)[:2]
    got = sorted((r["n"], -r["doc_id"]) for r in by_bucket["a"])
    assert sorted(best) == got


def test_composite_cursor_equals_offset(spark, hits_meta):
    """Page-2-via-cursor must equal ranks 6..10 of the full bucket
    enumeration — the exactness property that makes composite the
    sanctioned unbounded-agg export."""
    hits, meta = hits_meta
    keys = ["cat"]
    full = aggs.composite_page(hits, meta, keys, 1000).collect()
    page1 = aggs.composite_page(hits, meta, keys, 3).collect()
    after = aggs.composite_after_key(page1, keys)
    page2 = aggs.composite_page(hits, meta, keys, 3, after=after).collect()

    def key_of(r):
        return (r["query_id"], tuple(r[k] for k in keys))

    by_q: dict[int, list] = {}
    for r in sorted(full, key=key_of):
        by_q.setdefault(r["query_id"], []).append(
            (tuple(r[k] for k in keys), r["doc_count"]))
    exp = {qid: rows[3:6] for qid, rows in by_q.items()}
    got: dict[int, list] = {}
    for r in sorted(page2, key=key_of):
        got.setdefault(r["query_id"], []).append(
            (tuple(r[k] for k in keys), r["doc_count"]))
    assert got == exp


def _scores(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double")


def test_dis_max_combination(spark):
    b1 = _scores(spark, [(1, 10, 3.0), (1, 11, 1.0)])
    b2 = _scores(spark, [(1, 10, 2.0), (1, 12, 5.0)])
    out = {r["doc_id"]: r["score"]
           for r in dis_max_scores([b1, b2], tie_breaker=0.3).collect()}
    assert out[10] == pytest.approx(3.0 + 0.3 * 2.0)
    assert out[11] == pytest.approx(1.0)
    assert out[12] == pytest.approx(5.0)
    # tie_breaker=1.0 degenerates to the plain should-sum
    s = {r["doc_id"]: r["score"]
         for r in dis_max_scores([b1, b2], tie_breaker=1.0).collect()}
    assert s[10] == pytest.approx(5.0)


def test_rescore_only_reranks_window(spark):
    """A doc outside the rescore window can never jump into the top-k on
    rescore score alone; window docs missing from the rescorer keep
    qw·base."""
    base = _scores(spark, [(1, d, 100.0 - d) for d in range(1, 6)])
    rescorer = _scores(spark, [(1, 5, 1000.0), (1, 99, 1000.0)])
    out = rescore_topk(base, rescorer, window_size=3, k=3,
                       query_weight=1.0, rescore_weight=2.0).collect()
    got = [(r["doc_id"], r["score"]) for r in sorted(
        out, key=lambda r: (-r["score"], r["doc_id"]))]
    # window = docs 1..3 (base order); doc 5's giant rescore is irrelevant
    # because doc 5 is outside the window; doc 99 matches nothing in base.
    assert [d for d, _ in got] == [1, 2, 3]
    assert got[0][1] == pytest.approx(99.0)


def test_phrase_prefix_expansion_cap_and_union(spark):
    from dp_search_data_importer_spark.operators.phrase import (
        doc_positions,
        expand_prefix_terms,
        phrase_prefix_matches_batch,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha bet"), (3, "alpha gamma"),
         (4, "beta alpha")],
        "doc_id long, text string")
    pos = doc_positions(docs)
    term_dict = pos.select("term").distinct()
    # lexicographic cap: max_expansions=1 keeps only 'bet'
    assert expand_prefix_terms(term_dict, "bet", max_expansions=1) == ["bet"]
    full = expand_prefix_terms(term_dict, "bet")
    assert full == ["bet", "beta"]
    m = {r["doc_id"]: r["phrase_tf"]
         for r in phrase_prefix_matches_batch(
             pos, [(7, ["alpha"], full)]).collect()}
    # MultiPhrase union: docs 1 AND 2 match "alpha bet*"; 3, 4 don't
    assert m == {1: 1, 2: 1}
