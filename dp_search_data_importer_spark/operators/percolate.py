"""ES ``percolate`` twin: match STORED queries against documents.

The reference delegates percolation to Elasticsearch (the percolate
query type, ``handler/handler.go:95`` forwards bodies verbatim); this
is the Spark-native reverse-search operator for the
monitoring/alerting shape — millions of registered queries, a stream
of documents, "which queries match this doc?".

Query table schema: ``(query_id long, kind string, terms
array<string>)`` with kinds

- ``match``      — OR semantics: any term present
- ``match_all``  — AND semantics: every term present
- ``phrase``     — the terms appear consecutively, in order

:func:`percolate_bool_batch` additionally evaluates stored BOOL
queries — ``(query_id, must array, should array, must_not array,
minimum_should_match)`` — with ES compound semantics: every must term
present, ≥ msm distinct should terms present, no must_not term
present. Candidates come from the same term-inverted join (a doc
surfaces only by matching some must/should/must_not term; docs
touching ONLY must_not terms are filtered by the must/should gates,
and docs touching none are correctly absent — they can only fail the
gates if n_must > 0 or msm > 0, and a bool query with neither is
match-all, which is rejected as unpercolatable).

Physical shape — the INVERTED design (queries indexed by term), the
same discipline as the document index: stored queries explode to
(term, query_id, idx) slot rows once, documents tokenize to (doc_id,
term, positions) once, and ONE term-keyed shuffle join + ONE hash agg
per (query, doc) candidate decides every kind — match by any-slot hit,
match_all by distinct-slot count, phrase by the idx-shifted position
intersection (the ``phrase_matches_batch`` fold). No per-query jobs,
no per-doc loops, zero Python on the data path.

Scale notes: the join key is the TERM — a stored query containing a
stopword candidates every doc holding it (classic percolation cost).
Register queries with their selective terms (or pre-filter the slot
table against df stats) the way Lucene's percolator extracts required
terms; the operator itself stays skew-safe because the hot term's rows
spread across doc partitions, and AQE skew-join splitting covers the
agg side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["percolate_batch", "percolate_bool_batch"]

_KINDS = ("match", "match_all", "phrase")


def percolate_batch(queries: DataFrame, pos: DataFrame) -> DataFrame:
    """(query_id, doc_id) pairs where the stored query matches the doc.

    ``queries``: (query_id, kind, terms array<string>) — see module
    docstring. ``pos``: (doc_id, term, positions array<int>, dl) — the
    ``doc_positions`` / positional-index frame the phrase operators use.
    """
    qslots = queries.select(
        "query_id", "kind", F.size("terms").alias("n_terms"),
        F.posexplode("terms").alias("idx", "term"))

    j = pos.join(qslots, "term")
    agg = (
        j.groupBy("query_id", "doc_id")
        .agg(F.first("kind").alias("kind"),
             F.first("n_terms").alias("n_terms"),
             F.count_distinct("idx").alias("n_idx"),
             F.collect_list(F.struct("idx", "positions")).alias("arr"))
    )
    # phrase verification: start positions = ∩_i {p − i}, same fold as
    # phrase_matches_batch (order-insensitive Catalyst set algebra)
    shifted = F.transform(
        F.array_sort("arr"),
        lambda x: F.transform(x["positions"], lambda p: p - x["idx"]))
    folded = F.aggregate(
        F.slice(shifted, F.lit(2), F.size(shifted) - F.lit(1)),
        F.element_at(shifted, 1),
        lambda acc, s: F.array_intersect(acc, s),
    )
    matched = agg.filter(
        F.when(F.col("kind") == "match", F.col("n_idx") >= 1)
        .when(F.col("kind") == "match_all",
              F.col("n_idx") == F.col("n_terms"))
        .when(F.col("kind") == "phrase",
              (F.col("n_idx") == F.col("n_terms"))
              & (F.size(folded) > 0))
        .otherwise(F.lit(False)))
    return matched.select("query_id", "doc_id")


def percolate_bool_batch(queries: DataFrame, pos: DataFrame) -> DataFrame:
    """Stored BOOL queries against documents — (query_id, doc_id) where
    the compound matches (see module docstring for the exact gates).

    ``queries``: (query_id, must array<string>, should array<string>,
    must_not array<string>, minimum_should_match int). Same inverted
    physical shape as :func:`percolate_batch`: role-tagged slot rows,
    one term-keyed join, one hash agg with three conditional
    distinct-counts."""
    qcounts = queries.select(
        "query_id",
        F.size(F.coalesce("must", F.array())).alias("n_must"),
        F.coalesce("minimum_should_match", F.lit(0)).alias("msm"))
    if qcounts.filter(
            (F.col("n_must") == 0) & (F.col("msm") <= 0)).take(1):
        raise ValueError(
            "bool percolation requires every query to have must "
            "terms or minimum_should_match > 0 (otherwise it is "
            "match-all, which cannot be term-inverted)")
    slots = queries.select(
        "query_id",
        F.explode(
            F.concat(
                F.transform(F.coalesce("must", F.array()),
                            lambda t: F.struct(
                                F.lit("must").alias("role"),
                                t.alias("term"))),
                F.transform(F.coalesce("should", F.array()),
                            lambda t: F.struct(
                                F.lit("should").alias("role"),
                                t.alias("term"))),
                F.transform(F.coalesce("must_not", F.array()),
                            lambda t: F.struct(
                                F.lit("not").alias("role"),
                                t.alias("term"))),
            )).alias("s")
    ).select("query_id", "s.role", "s.term").distinct()

    j = pos.select("doc_id", "term").join(F.broadcast(slots), "term")
    agg = (
        j.groupBy("query_id", "doc_id")
        .agg(F.count_distinct(
                 F.when(F.col("role") == "must", F.col("term")))
             .alias("m_hit"),
             F.count_distinct(
                 F.when(F.col("role") == "should", F.col("term")))
             .alias("s_hit"),
             F.count_distinct(
                 F.when(F.col("role") == "not", F.col("term")))
             .alias("n_hit"))
        .join(F.broadcast(qcounts), "query_id")
    )
    return agg.filter(
        (F.col("m_hit") == F.col("n_must"))
        & (F.col("s_hit") >= F.col("msm"))
        & (F.col("n_hit") == 0)
    ).select("query_id", "doc_id")
