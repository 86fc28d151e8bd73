"""ES span-query family over token positions: ``span_term``,
``span_or``, ``span_near`` (ordered), ``span_first``, ``span_not``.

The reference delegates span queries to Elasticsearch verbatim
(``handler/handler.go:95`` forwards the request body); this is the
Spark-native twin over the same positional frames the phrase operators
use (``operators/phrase.py``) — (doc_id, term, positions array<int>,
dl), from either the in-block positional index or ``doc_positions``.

Scope and semantics (clauses are TERM-LEVEL, length-1 spans — the
span_term / span_or-of-span_terms compositions, which is the
overwhelmingly common usage):

- ``span_near`` (``in_order: true``): an increasing position chain
  p_1 < … < p_n, one position per clause slot, with total intervening
  gap p_n − p_1 − (n−1) ≤ slop; tf = number of distinct chain starts.
  At slop=0 and single-term slots this IS the exact phrase.
- ``span_near`` (``in_order: false``): window-cover semantics — see
  :func:`span_unordered_matches_batch` (match/no-match agrees with
  Lucene's unordered matcher; the frequency definition is ours and is
  stated exactly, oracle-replayed).
- ``span_first``: spans whose END (start+1 for length-1) ≤ ``end``.
  Composes with span_near: the greedy earliest-next fold yields the
  MINIMAL chain end per start (each step takes the smallest feasible
  position — induction), so filtering the folded (start, cur) states
  is exact "exists a chain ending within the limit".
- ``span_not``: include-clause positions with NO exclude-clause
  position in ``[p − pre, p + post]`` (the ES pre/post exclusion
  window; the 0/0 default is pure overlap).

Physical shape — identical to the batch phrase path: ONE broadcast
slot-table join tags term-filtered position rows, one hash agg per
(query, doc) collects slots, and the chain search is a Catalyst
``aggregate`` fold (zero Python on the data path). Scoring reuses
``phrase_score_batch``: BM25 over span frequencies with exact df,
Lucene's sloppy-frequency discount (1/(1+slop)) not applied —
documented, the oracle replays the same formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["span_matches_batch", "span_not_matches_batch",
           "span_unordered_matches_batch"]


def span_matches_batch(
        pos: DataFrame,
        specs: list[tuple[int, list[list[str]], int, int | None]],
) -> DataFrame:
    """(query_id, doc_id, span_tf, dl) for ordered span chains — ALL
    queries in ONE plan. ``specs`` rows are (query_id, slots, slop,
    end_limit): ``slots`` is one term-set per clause (span_or = a
    multi-term slot, span_term = a singleton), ``end_limit`` the
    span_first bound on the chain end (None = unbounded).

    Single-slot specs (span_term / span_or / span_first over a leaf)
    ride the same plan with an empty fold."""
    from dp_search_data_importer_spark.session import local_df

    spark = pos.sparkSession
    slot_rows = [(qid, i, t) for qid, slots, _, _ in specs
                 for i, ts in enumerate(slots) for t in sorted(set(ts))]
    len_rows = [(qid, len(slots), int(slop),
                 -1 if end is None else int(end))
                for qid, slots, slop, end in specs]
    slots_df = local_df(spark, slot_rows,
                        "query_id long, idx int, term string")
    qlens = local_df(spark, len_rows,
                     "query_id long, n_tokens int, slop int, "
                     "end_limit int")

    j = pos.join(F.broadcast(slots_df), "term")
    # span_or slots: union positions across the slot's terms (the
    # MultiPhrase pre-agg shape from phrase_prefix_matches_batch)
    per_slot = (
        j.groupBy("query_id", "doc_id", "idx")
        .agg(F.first("dl").alias("dl"),
             F.array_sort(F.array_distinct(
                 F.flatten(F.collect_list("positions"))))
             .alias("positions"))
    )
    agg = (
        per_slot.groupBy("query_id", "doc_id")
        .agg(F.first("dl").alias("dl"),
             F.count(F.lit(1)).alias("n_idx"),
             F.collect_list(F.struct("idx", "positions")).alias("arr"))
        .join(F.broadcast(qlens), "query_id")
        .filter(F.col("n_idx") == F.col("n_tokens"))
    )
    span = F.col("n_tokens") - F.lit(1) + F.col("slop")
    arr = F.array_sort("arr")  # structs sort by leading field = idx
    init = F.transform(
        F.element_at(arr, 1)["positions"],
        lambda p: F.struct(p.alias("start"), p.alias("cur")),
    )
    folded = F.aggregate(
        F.slice(arr, F.lit(2), F.size(arr) - F.lit(1)),
        init,
        lambda acc, s: F.filter(
            F.transform(
                acc,
                lambda x: F.struct(
                    x["start"].alias("start"),
                    F.array_min(F.filter(
                        s["positions"],
                        lambda q: (q > x["cur"]) & (q <= x["start"] + span),
                    )).alias("cur"),
                ),
            ),
            lambda x: x["cur"].isNotNull(),
        ),
    )
    # span_first: chain end (cur + 1 in end-exclusive terms) ≤ limit;
    # greedy fold state carries the minimal end per start, so this
    # filter is exact (see module docstring)
    kept = F.when(
        F.col("end_limit") >= 0,
        F.filter(folded, lambda x: x["cur"] + 1 <= F.col("end_limit")),
    ).otherwise(folded)
    return (
        agg.select("query_id", "doc_id",
                   F.size(kept).cast("long").alias("span_tf"), "dl")
        .filter(F.col("span_tf") > 0)
    )


def span_unordered_matches_batch(
        pos: DataFrame,
        specs: list[tuple[int, list[list[str]], int]],
) -> DataFrame:
    """``span_near`` with ``in_order: false`` — window-cover semantics,
    stated exactly (Lucene's unordered matcher agrees on match/no-match;
    its sloppy-frequency differs and is NOT reproduced): with window
    length W = n_slots + slop, ``span_tf`` counts positions e (over the
    union of slot positions) where EVERY slot has an occurrence inside
    ``[e − W + 1, e]`` — i.e. the number of window ends covering all
    clauses. A doc matches iff any such end exists.

    Same physical shape as the ordered fold: one broadcast slot join,
    one hash agg, then a pure Catalyst filter/forall/exists over the
    per-slot sorted arrays — no Python, cost |union| · n · |slot|
    array ops per candidate doc (query-term-bounded)."""
    from dp_search_data_importer_spark.session import local_df

    spark = pos.sparkSession
    slot_rows = [(qid, i, t) for qid, slots, _ in specs
                 for i, ts in enumerate(slots) for t in sorted(set(ts))]
    len_rows = [(qid, len(slots), int(slop))
                for qid, slots, slop in specs]
    slots_df = local_df(spark, slot_rows,
                        "query_id long, idx int, term string")
    qlens = local_df(spark, len_rows,
                     "query_id long, n_tokens int, slop int")

    j = pos.join(F.broadcast(slots_df), "term")
    per_slot = (
        j.groupBy("query_id", "doc_id", "idx")
        .agg(F.first("dl").alias("dl"),
             F.array_sort(F.array_distinct(
                 F.flatten(F.collect_list("positions"))))
             .alias("positions"))
    )
    agg = (
        per_slot.groupBy("query_id", "doc_id")
        .agg(F.first("dl").alias("dl"),
             F.count(F.lit(1)).alias("n_idx"),
             F.collect_list(F.struct("idx", "positions")).alias("arr"))
        .join(F.broadcast(qlens), "query_id")
        .filter(F.col("n_idx") == F.col("n_tokens"))
    )
    w = F.col("n_tokens") + F.col("slop")  # window length
    union = F.array_distinct(F.flatten(
        F.transform("arr", lambda x: x["positions"])))
    ends = F.filter(
        union,
        lambda e: F.forall(
            F.col("arr"),
            lambda s: F.exists(
                s["positions"],
                lambda q: (q >= e - w + 1) & (q <= e))),
    )
    return (
        agg.select("query_id", "doc_id",
                   F.size(ends).cast("long").alias("span_tf"), "dl")
        .filter(F.col("span_tf") > 0)
    )


def span_not_matches_batch(
        pos: DataFrame,
        specs: list[tuple[int, list[str], list[str], int, int]],
) -> DataFrame:
    """ES ``span_not`` twin: (query_id, doc_id, span_tf, dl) where
    ``span_tf`` counts include-clause positions with no exclude-clause
    position inside ``[p − pre, p + post]``. ``specs`` rows are
    (query_id, include_terms, exclude_terms, pre, post).

    Shape: two term-pruned slot joins (include / exclude), ONE
    left-join per (query, doc) — docs with no exclude positions keep
    every include position — and the window test is a Catalyst
    ``filter``/``exists`` pair over the two sorted arrays."""
    from dp_search_data_importer_spark.session import local_df

    spark = pos.sparkSession

    def _side(rows_schema, rows, out_col):
        tdf = local_df(spark, rows, rows_schema)
        return (
            pos.join(F.broadcast(tdf), "term")
            .groupBy("query_id", "doc_id")
            .agg(F.first("dl").alias("dl"),
                 F.array_sort(F.array_distinct(
                     F.flatten(F.collect_list("positions"))))
                 .alias(out_col))
        )

    inc = _side("query_id long, term string",
                [(qid, t) for qid, its, _, _, _ in specs
                 for t in sorted(set(its))], "ip")
    exc = _side("query_id long, term string",
                [(qid, t) for qid, _, ets, _, _ in specs
                 for t in sorted(set(ets))], "ep").drop("dl")
    win = local_df(spark, [(qid, int(pre), int(post))
                           for qid, _, _, pre, post in specs],
                   "query_id long, pre int, post int")
    j = (inc.join(exc, ["query_id", "doc_id"], "left")
         .join(F.broadcast(win), "query_id"))
    ep = F.coalesce(F.col("ep"), F.array().cast("array<int>"))
    kept = F.filter(
        F.col("ip"),
        lambda p: ~F.exists(
            ep, lambda q: (q >= p - F.col("pre"))
            & (q <= p + F.col("post"))),
    )
    return (
        j.select("query_id", "doc_id",
                 F.size(kept).cast("long").alias("span_tf"), "dl")
        .filter(F.col("span_tf") > 0)
    )
