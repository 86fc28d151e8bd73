"""Percolate (reverse search) semantics + plan shape."""
from __future__ import annotations

from pyspark.sql import functions as F

from dp_search_data_importer_spark.operators.percolate import (
    percolate_batch,
)
from dp_search_data_importer_spark.operators.phrase import doc_positions
from dp_search_data_importer_spark.session import local_df


def _pairs(df):
    return {(r["query_id"], r["doc_id"]) for r in df.collect()}


def test_percolate_kind_semantics(spark, sf_dir):
    from dp_search_data_importer_spark.plans.driver_queries import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    pos = doc_positions(docs, code_aware=False).cache()
    q = local_df(spark, [
        (1, "match", ["hash", "join"]),
        (2, "match_all", ["hash", "join"]),
        (3, "phrase", ["hash", "join"]),
        (4, "phrase", ["hash"]),
    ], "query_id long, kind string, terms array<string>")
    got = percolate_batch(q, pos)
    by_q = {}
    for qid, d in _pairs(got):
        by_q.setdefault(qid, set()).add(d)
    # phrase ⊆ AND ⊆ OR, strictly at this corpus
    assert by_q[3] < by_q[2] < by_q[1]
    # length-1 phrase == plain containment
    import re

    exp = {r["doc_id"] for r in docs.select("doc_id", "text").collect()
           if "hash" in re.split(r"[^a-z0-9]+", r["text"].lower())}
    assert by_q[4] == exp
    # brute-force the adjacency for a sample of phrase matches
    texts = {r["doc_id"]: r["text"]
             for r in docs.select("doc_id", "text").collect()}
    for d in sorted(by_q[3])[:20]:
        toks = [t for t in re.split(r"[^a-z0-9]+", texts[d].lower()) if t]
        assert any(a == "hash" and b == "join"
                   for a, b in zip(toks, toks[1:])), d
    pos.unpersist()


def test_percolate_plan_no_cartesian(spark, sf_dir):
    """The match decision is ONE term-keyed join + ONE agg — no
    cartesian/nested-loop product of queries × docs in the plan."""
    from dp_search_data_importer_spark.plans.driver_queries import (
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = local_df(spark, [(1, "match_all", ["hash", "join"])],
                 "query_id long, kind string, terms array<string>")
    plan = percolate_batch(
        q, doc_positions(docs, code_aware=False))._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_percolate_bool_gates(spark, sf_dir):
    """Bool percolation: must/should(msm)/must_not gates vs a
    brute-force token-set scan; match-all bool rejected."""
    import re

    import pytest

    from dp_search_data_importer_spark.plans.driver_queries import (
        load_table,
    )
    from dp_search_data_importer_spark.operators.percolate import (
        percolate_bool_batch,
    )

    docs = load_table(spark, sf_dir, "documents")
    pos = doc_positions(docs, code_aware=False)
    q = local_df(spark, [
        (1, ["hash"], ["join", "merge"], ["table"], 1),
        (2, [], ["hash", "join"], [], 2),
    ], "query_id long, must array<string>, should array<string>, "
       "must_not array<string>, minimum_should_match int")
    got = {}
    for qid, d in _pairs(percolate_bool_batch(q, pos)):
        got.setdefault(qid, set()).add(d)
    toksets = {r["doc_id"]: set(re.split(r"[^a-z0-9]+",
                                         r["text"].lower()))
               for r in docs.select("doc_id", "text").collect()}
    exp1 = {d for d, t in toksets.items()
            if "hash" in t and len({"join", "merge"} & t) >= 1
            and "table" not in t}
    exp2 = {d for d, t in toksets.items()
            if len({"hash", "join"} & t) >= 2}
    assert got.get(1, set()) == exp1 and got.get(2, set()) == exp2
    bad = local_df(spark, [(9, [], ["x"], [], 0)],
                   "query_id long, must array<string>, "
                   "should array<string>, must_not array<string>, "
                   "minimum_should_match int")
    with pytest.raises(ValueError):
        percolate_bool_batch(bad, pos)
