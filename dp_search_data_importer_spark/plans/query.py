"""Query engine over the built index (SURVEY.md §3.1 query lifecycle).

Two paths, rank-identical by construction and by test:

- **exact** — decompress candidate blocks → Catalyst BM25 expressions →
  windowed top-k. The permanent correctness oracle (SURVEY.md §7 step 5).
- **wand**  — block-max WAND inside mapInPandas per shard → local top-k →
  global merge. The fast path: decodes only the blocks it cannot skip.

Both share the same physical reading pattern, which is what scales:
parquet scan of ``postings/`` with ``term IN (query terms)`` pushed down
(PushedFilters; blocks are term-sorted within files so row-group min/max
stats prune), shard-dir layout prunes nothing for queries (all shards hold
all terms) but gives the fan-out axis; ``docs/`` is touched only to resolve
the final ≤ k·|queries| winners back to (repo, path, commit) — never joined
against postings-sized data.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.checkpoint import read_stats_json
from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.operators.bm25 import (
    bm25_scores,
    query_terms,
    topk,
)
from dp_search_data_importer_spark.operators.wand import wand_partition


def load_blocks(spark: SparkSession, out_dir: str,
                terms: list[str] | None = None) -> DataFrame:
    # a crash mid-commit of an incremental upsert must not serve a MIXED
    # pre/post index from the read path: roll the staged commit forward
    # first (one os.path.exists in the common case — see update_index)
    from dp_search_data_importer_spark.plans.update_index import (
        recover_for_read,
    )

    recover_for_read(out_dir)
    df = spark.read.parquet(os.path.join(out_dir, "postings"))
    if terms is not None:
        df = df.filter(F.col("term").isin(terms))
    return df


def decompress_blocks(blocks: DataFrame,
                      include_positions: bool = False) -> DataFrame:
    """(shard, term, blocks…) → (doc_id, term, tf, dl[, positions]) rows via
    the numpy codec in Arrow batches. Used by the exact path and by
    index-integrity tests (round-trip vs the original tf pairs).
    ``include_positions`` decodes each posting's token positions from the
    block's ``poss`` stream (positional indexes only)."""
    import numpy as np
    import pandas as pd

    from dp_search_data_importer_spark.operators.codec import (
        decode_block,
        decode_positions,
    )

    def gen(batches):
        for pdf in batches:
            ids_all, terms_all, tfs_all, dls_all = [], [], [], []
            pos_all: list = []
            cols = zip(pdf["term"], pdf["doc_gaps"], pdf["tfs"], pdf["dls"],
                       pdf["poss"] if include_positions else pdf["term"])
            for term, g, t, d, p in cols:
                ids, tfs, dls = decode_block(g, t, d)
                ids_all.append(ids)
                terms_all.extend([term] * len(ids))
                tfs_all.append(tfs)
                dls_all.append(dls)
                if include_positions:
                    flat = decode_positions(p, tfs)
                    pos_all.extend(np.split(flat, np.cumsum(tfs)[:-1]))
            if not ids_all:
                continue
            out = {"doc_id": np.concatenate(ids_all),
                   "term": terms_all,
                   "tf": np.concatenate(tfs_all),
                   "dl": np.concatenate(dls_all)}
            if include_positions:
                out["positions"] = pos_all
            yield pd.DataFrame(out)

    schema = "doc_id long, term string, tf long, dl long"
    if include_positions:
        schema += ", positions array<int>"
    return blocks.mapInPandas(gen, schema=schema)


def _stats_df(spark: SparkSession, out_dir: str) -> tuple[DataFrame, dict]:
    from dp_search_data_importer_spark.session import local_df

    stats = read_stats_json(out_dir)
    sdf = local_df(
        spark, [(stats["n_docs"], stats["avgdl"])], "n_docs long, avgdl double"
    )
    return sdf, stats


def _query_term_pairs(queries: DataFrame,
                      code_aware: bool) -> list[tuple[int, str]]:
    """Distinct (query_id, term) pairs tokenized DRIVER-side with the
    property-tested Python twins of the analyzers (same discipline as
    ``phrase_topk``): the query batch is a driver-sized frame by contract
    (interactive query sets), so collecting it and tokenizing in Python
    replaces a Spark job (explode+distinct+collect) per request with
    driver work — the term list is needed on the driver anyway for the
    postings-scan pushdown."""
    from dp_search_data_importer_spark.functions.tokenize import (
        _code_tokens_py,
        _simple_tokens_py,
    )

    tok = _code_tokens_py if code_aware else _simple_tokens_py
    rows = queries.select("query_id", "query_text").collect()
    return sorted({(int(r["query_id"]), t)
                   for r in rows for t in tok(r["query_text"] or "")})


# analyzed-plan memo for repeated identical exact-path requests (same
# defense as the driver_queries plan memo: a DataFrame is an immutable
# analyzed plan; executing it recomputes from the index parquet). The key
# pins the INDEX VERSION via stats.json identity — every index commit
# (build, upsert, delete) swaps stats.json last, so a mutated index always
# misses and re-plans against the new file set; the memo is also checked
# only after read_stats_json's crash-recovery roll-forward. wand_topk is
# deliberately NOT memoized: its construction collects term_df rows
# (corpus-derived idf values), which a memo would pin instead of recompute.
_EXACT_PLAN_MEMO: dict[tuple, DataFrame] = {}


def exact_topk(spark: SparkSession, out_dir: str, queries: DataFrame,
               cfg: EngineConfig | None = None, k: int | None = None,
               after: dict[int, tuple[float, int]] | None = None) -> DataFrame:
    """Exact path over the compressed index. The query analyzer follows the
    index's recorded analyzer (stats.json code_aware) — analyzer symmetry.
    ``after`` paginates (ES ``search_after`` twin — see
    ``operators.bm25.topk``): the cursor predicate applies before the
    window, so page n never re-materializes pages 1..n−1."""
    from dp_search_data_importer_spark.session import local_df

    cfg = cfg or EngineConfig()
    stats_sdf, stats = _stats_df(spark, out_dir)
    key = None
    try:
        st = os.stat(os.path.join(out_dir, "stats.json"))
        key = (spark.sparkContext.applicationId, out_dir,
               st.st_mtime_ns, st.st_size, queries.semanticHash(),
               repr(cfg), k, repr(sorted((after or {}).items())))
    except Exception:
        key = None
    if key is not None and key in _EXACT_PLAN_MEMO:
        return _EXACT_PLAN_MEMO[key]
    pairs = _query_term_pairs(queries, stats.get("code_aware", False))
    qt = local_df(spark, pairs, "query_id long, term string")
    terms = sorted({t for _, t in pairs})
    blocks = load_blocks(spark, out_dir, terms)
    tf = decompress_blocks(blocks)
    dfs = spark.read.parquet(os.path.join(out_dir, "term_df")).filter(
        F.col("term").isin(terms)
    )
    scores = bm25_scores(tf, qt, dfs, stats_sdf, cfg)
    out = topk(scores, k or cfg.k, after=after)
    if key is not None:
        if len(_EXACT_PLAN_MEMO) > 512:
            _EXACT_PLAN_MEMO.clear()
        _EXACT_PLAN_MEMO[key] = out
    return out


def wand_topk(spark: SparkSession, out_dir: str, queries: DataFrame,
              cfg: EngineConfig | None = None, k: int | None = None) -> DataFrame:
    """Block-max WAND path over the compressed index."""
    cfg = cfg or EngineConfig()
    k = k or cfg.k
    _, stats = _stats_df(spark, out_dir)
    pairs = _query_term_pairs(queries, stats.get("code_aware", False))
    qmap: dict[int, list[str]] = {}
    for qid, t in pairs:
        qmap.setdefault(qid, []).append(t)
    terms = sorted({t for ts in qmap.values() for t in ts})
    if not terms:
        from dp_search_data_importer_spark.session import local_df

        return local_df(spark, [], "query_id long, doc_id long, score double")
    n, avgdl = stats["n_docs"], stats["avgdl"]
    df_rows = (
        spark.read.parquet(os.path.join(out_dir, "term_df"))
        .filter(F.col("term").isin(terms)).collect()
    )
    idfs = {
        r["term"]: math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in df_rows
    }
    blocks = load_blocks(spark, out_dir, terms)
    # the WAND kernel needs every block of a shard in one task: hash-partition
    # by shard (shards ≈ parallelism axis; each task runs 1+ whole shards)
    local = blocks.repartition(stats["n_shards"], "shard").mapInPandas(
        lambda it: wand_partition(it, qmap, idfs, k, cfg, avgdl),
        schema="query_id long, doc_id long, score double",
    )
    return topk(local, k)


def expand_terms(spark: SparkSession, out_dir: str, pattern: str,
                 mode: str = "prefix", max_edits: int = 1,
                 max_expansions: int = 50) -> list[str]:
    """Expand a query token against the term dictionary — the ES
    prefix/fuzzy query families. ``prefix`` pushes a StartsWith filter into
    the term_df parquet scan (PushedFilters — the dictionary is never fully
    materialized); ``fuzzy`` filters by Catalyst ``levenshtein`` with an
    early length-window prune. Expansion is capped like ES's
    ``max_expansions`` (highest-df terms win: most selective rankings need
    the common completions first)."""
    from dp_search_data_importer_spark.plans.update_index import (
        recover_for_read,
    )

    recover_for_read(out_dir)  # never expand against a mid-commit term_df
    tdf = spark.read.parquet(os.path.join(out_dir, "term_df"))
    if mode == "prefix":
        hits = tdf.filter(F.col("term").startswith(pattern))
    elif mode == "fuzzy":
        hits = tdf.filter(
            (F.length("term") >= F.lit(len(pattern) - max_edits))
            & (F.length("term") <= F.lit(len(pattern) + max_edits))
            & (F.levenshtein(F.col("term"), F.lit(pattern)) <= max_edits)
        )
    elif mode == "wildcard":
        # ES wildcard query: * = any run, ? = one char, anchored both ends
        hits = tdf.filter(F.col("term").rlike(wildcard_to_regex(pattern)))
    elif mode == "regexp":
        # ES regexp query is anchored (matches the WHOLE term)
        hits = tdf.filter(F.col("term").rlike(f"^(?:{pattern})$"))
    else:  # pragma: no cover
        raise ValueError(f"unknown expansion mode {mode!r}")
    rows = (hits.orderBy(F.col("df").desc(), F.col("term").asc())
            .limit(max_expansions).collect())
    return [r["term"] for r in rows]


def wildcard_to_regex(pattern: str) -> str:
    """ES wildcard pattern (``*`` any run, ``?`` one char) → an anchored
    regex using only constructs shared by Java regex and RE2, so the SQL
    oracle can apply the identical expression."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def _expanded_topk(spark: SparkSession, out_dir: str, tokens: list[str],
                   mode: str, cfg: EngineConfig | None, k: int | None,
                   max_edits: int = 1) -> DataFrame:
    from dp_search_data_importer_spark.session import local_df

    cfg = cfg or EngineConfig()
    terms = sorted({
        t for tok in tokens
        for t in expand_terms(spark, out_dir, tok, mode, max_edits)
    })
    if not terms:
        return local_df(spark, [], "query_id long, doc_id long, score double")
    qt = local_df(spark, [(1, t) for t in terms], "query_id long, term string")
    blocks = load_blocks(spark, out_dir, terms)
    tf = decompress_blocks(blocks)
    dfs = spark.read.parquet(os.path.join(out_dir, "term_df")).filter(
        F.col("term").isin(terms))
    stats_sdf, _ = _stats_df(spark, out_dir)
    scores = bm25_scores(tf, qt, dfs, stats_sdf, cfg)
    return topk(scores, k or cfg.k)


def expand_synonyms(tokens: list[str],
                    synonyms: dict[str, list[str]]) -> list[str]:
    """Query-time synonym expansion (ES analyzer synonym-filter twin):
    each analyzed query token expands to itself plus its dictionary
    synonyms; the result is the OR term set the scorer sees. Pure
    driver-side literal work — the dictionary is a broadcast-sized plan
    constant, exactly like the prefix/fuzzy expansions."""
    out: list[str] = []
    seen: set[str] = set()
    for t in tokens:
        for term in [t, *synonyms.get(t, [])]:
            if term not in seen:
                seen.add(term)
                out.append(term)
    return out


def synonym_topk(spark: SparkSession, out_dir: str,
                 queries: list[tuple[int, str]],
                 synonyms: dict[str, list[str]],
                 cfg: EngineConfig | None = None,
                 k: int | None = None) -> DataFrame:
    """ES query-time synonym search over the stored index: analyzer →
    per-token synonym expansion → standard OR-set BM25 (each synonym
    scores with its OWN df, the ES synonym-filter OR form). Same plan
    discipline as the other expansions: the expanded term set pushes into
    the postings scan, df rows broadcast."""
    from dp_search_data_importer_spark.functions.tokenize import (
        _code_tokens_py,
        _simple_tokens_py,
    )
    from dp_search_data_importer_spark.session import local_df

    cfg = cfg or EngineConfig()
    stats_sdf, stats = _stats_df(spark, out_dir)
    tok_py = (_code_tokens_py if stats.get("code_aware")
              else _simple_tokens_py)
    qt_rows = sorted({
        (qid, term)
        for qid, text in queries
        for term in expand_synonyms(tok_py(text), synonyms)
    })
    if not qt_rows:
        return local_df(spark, [], "query_id long, doc_id long, score double")
    qt = local_df(spark, qt_rows, "query_id long, term string")
    terms = sorted({t for _, t in qt_rows})
    tf = decompress_blocks(load_blocks(spark, out_dir, terms))
    dfs = spark.read.parquet(os.path.join(out_dir, "term_df")).filter(
        F.col("term").isin(terms))
    scores = bm25_scores(tf, qt, dfs, stats_sdf, cfg)
    return topk(scores, k or cfg.k)


def prefix_topk(spark: SparkSession, out_dir: str, prefixes: list[str],
                cfg: EngineConfig | None = None,
                k: int | None = None) -> DataFrame:
    """ES prefix-query twin: every dictionary term starting with any given
    prefix contributes BM25 mass; standard exact scoring over the expanded
    term set (term filter still pushed into the postings scan)."""
    return _expanded_topk(spark, out_dir, prefixes, "prefix", cfg, k)


def fuzzy_topk(spark: SparkSession, out_dir: str, tokens: list[str],
               cfg: EngineConfig | None = None, k: int | None = None,
               max_edits: int = 1) -> DataFrame:
    """ES fuzzy-query twin (edit distance ≤ max_edits via Catalyst
    levenshtein over the dictionary, length-window pruned)."""
    return _expanded_topk(spark, out_dir, tokens, "fuzzy", cfg, k, max_edits)


def wildcard_topk(spark: SparkSession, out_dir: str, patterns: list[str],
                  cfg: EngineConfig | None = None,
                  k: int | None = None) -> DataFrame:
    """ES wildcard-query twin: every dictionary term matching any ``*``/
    ``?`` pattern joins the OR set, scored with its own df (capped like
    ES ``max_expansions``, highest-df completions first). Dictionary scan
    only — the postings scan still receives the expanded literal term
    set as a pushed filter."""
    return _expanded_topk(spark, out_dir, patterns, "wildcard", cfg, k)


def regexp_topk(spark: SparkSession, out_dir: str, patterns: list[str],
                cfg: EngineConfig | None = None,
                k: int | None = None) -> DataFrame:
    """ES regexp-query twin (whole-term anchored, as ES documents)."""
    return _expanded_topk(spark, out_dir, patterns, "regexp", cfg, k)


def bool_topk_indexed(spark: SparkSession, out_dir: str, specs,
                      cfg: EngineConfig | None = None,
                      k: int | None = None, doc_filter=None,
                      broadcast_limit: int = 2_000_000) -> DataFrame:
    """ES ``bool`` query over the STORED index: same operator as
    :func:`operators.bm25.bool_topk`, fed from the compressed postings
    with the full clause term set (must + should + must_not — the
    not-clauses need their postings too, to flag exclusions) pushed into
    the scan as a term filter.

    ``doc_filter`` adds the bool query's FILTER clause (ES filter
    context): a metadata predicate on the docs table that gates
    candidates before scoring and never contributes to the score —
    composed exactly like :func:`filtered_topk` (size-gated broadcast
    semi-join before the agg), completing the full ES bool surface
    (must + should/msm + must_not + filter) in one call."""
    from dp_search_data_importer_spark.operators.bm25 import bool_topk

    cfg = cfg or EngineConfig()
    stats_sdf, stats = _stats_df(spark, out_dir)
    terms = sorted({
        t for s in specs for t in (s.must + s.should + s.must_not)
    })
    tf = decompress_blocks(load_blocks(spark, out_dir, terms))
    if doc_filter is not None:
        allowed = (
            spark.read.parquet(os.path.join(out_dir, "docs"))
            .filter(doc_filter).select("doc_id")
        )
        small = stats.get("n_docs", 0) <= broadcast_limit
        if not small:
            small = allowed.count() <= broadcast_limit
        allowed = F.broadcast(allowed) if small else allowed
        tf = tf.join(allowed, "doc_id", "left_semi")
    dfs = spark.read.parquet(os.path.join(out_dir, "term_df")).filter(
        F.col("term").isin(terms))
    # filter context is known HERE, so the ES msm default resolves here:
    # a should-only spec under a filter defaults to msm=0 (ES 7.10), not 1
    return bool_topk(tf, specs, dfs, stats_sdf, cfg, k or cfg.k,
                     has_filter=doc_filter is not None)


def resolve_docs(spark: SparkSession, out_dir: str, results: DataFrame) -> DataFrame:
    """Map winning doc_ids back to (repo, path, commit, lang) — the engine's
    analogue of the reference returning ES `_id`-keyed documents. Winner set
    is tiny → broadcast it against the docs table."""
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    return F.broadcast(results).join(
        docs.select("doc_id", "repo", "path", "commit", "lang"), "doc_id", "inner"
    )


def build_fielded_index(spark: SparkSession, docs: DataFrame, out_dir: str,
                        field_boosts: dict[str, float],
                        cfg: EngineConfig | None = None,
                        **build_kwargs) -> dict:
    """Multi-field STORED index (ES parity: the reference's documents are
    multi-field — title/summary/keywords): one independent sub-index per
    field under ``<out>/fields/<name>/`` (own postings/df/avgdl, exactly
    Lucene's per-field statistics), boosts recorded alongside. ``docs``
    must carry ``doc_id`` plus one text column per field; rows where a
    field is empty simply index no terms there."""
    import json

    from dp_search_data_importer_spark.plans.build_index import build_index

    cfg = cfg or EngineConfig()
    stats = {}
    for field in field_boosts:
        stats[field] = build_index(
            spark, docs.select("doc_id", F.col(field).alias("content")),
            os.path.join(out_dir, "fields", field), cfg,
            already_normalized=True, **build_kwargs)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "fields.json"), "w") as f:
        json.dump({"boosts": {k: float(v) for k, v in field_boosts.items()}},
                  f, indent=2, sort_keys=True)
    return stats


def fielded_topk(spark: SparkSession, out_dir: str, queries: DataFrame,
                 cfg: EngineConfig | None = None,
                 k: int | None = None) -> DataFrame:
    """ES ``multi_match``/``most_fields`` over the stored fielded index:
    each field scores independently through the standard exact path (term
    filter pushed into ITS postings scan), boost-weighted scores sum per
    (query, doc), rounded-score deterministic top-k."""
    import json

    from dp_search_data_importer_spark.operators.bm25 import topk

    cfg = cfg or EngineConfig()
    with open(os.path.join(out_dir, "fields.json")) as f:
        boosts = json.load(f)["boosts"]
    per_field = []
    for field, boost in boosts.items():
        fdir = os.path.join(out_dir, "fields", field)
        stats = read_stats_json(fdir)
        qt = query_terms(queries, code_aware=stats.get("code_aware", False))
        terms = [r["term"] for r in qt.select("term").distinct().collect()]
        tf = decompress_blocks(load_blocks(spark, fdir, terms))
        dfs = spark.read.parquet(os.path.join(fdir, "term_df")).filter(
            F.col("term").isin(terms))
        stats_sdf, _ = _stats_df(spark, fdir)
        s = bm25_scores(tf, qt, dfs, stats_sdf, cfg).withColumn(
            "score", F.col("score") * F.lit(float(boost)))
        per_field.append(s)
    union = per_field[0]
    for s in per_field[1:]:
        union = union.unionByName(s)
    summed = union.groupBy("query_id", "doc_id").agg(
        F.sum("score").alias("score"))
    return topk(summed, k or cfg.k)


def filtered_topk(spark: SparkSession, out_dir: str, queries: DataFrame,
                  doc_filter, cfg: EngineConfig | None = None,
                  k: int | None = None,
                  broadcast_limit: int = 2_000_000) -> DataFrame:
    """ES bool-query ``filter`` twin: score only documents matching a
    metadata predicate (e.g. ``F.col("lang") == "py"``) — the filter does
    NOT contribute to the score, exactly like ES filter context.

    Plan shape at scale: the predicate evaluates on the docs table
    (content-free, column-pruned), the surviving doc_id set joins
    left-semi against the candidate postings BEFORE scoring — candidates
    are term-pruned already, so the semi-join input is small, and the
    window top-k runs on filtered rows only (a post-filter would
    under-fill k). The broadcast hint is GATED on size: a broad filter
    (e.g. a language matching most of a web corpus) can survive with
    millions of ids, and force-broadcasting that OOMs the driver — when
    the corpus (or, if needed, a count of the surviving set) exceeds
    ``broadcast_limit``, the hint is dropped and AQE picks the join
    strategy (shuffle semi-join with runtime stats)."""
    cfg = cfg or EngineConfig()
    stats = read_stats_json(out_dir)
    qt = query_terms(queries, code_aware=stats.get("code_aware", False))
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    tf = decompress_blocks(load_blocks(spark, out_dir, terms))
    allowed = (
        spark.read.parquet(os.path.join(out_dir, "docs"))
        .filter(doc_filter).select("doc_id")
    )
    # cheap gate first: |allowed| ≤ n_docs, so a small corpus needs no
    # count job at all; only a big corpus pays one count over the pushed
    # predicate on the content-free docs table
    small = stats.get("n_docs", 0) <= broadcast_limit
    if not small:
        small = allowed.count() <= broadcast_limit
    allowed = F.broadcast(allowed) if small else allowed
    tf = tf.join(allowed, "doc_id", "left_semi")
    dfs = spark.read.parquet(os.path.join(out_dir, "term_df")).filter(
        F.col("term").isin(terms))
    stats_sdf, _ = _stats_df(spark, out_dir)
    from dp_search_data_importer_spark.operators.bm25 import topk

    scores = bm25_scores(tf, qt, dfs, stats_sdf, cfg)
    return topk(scores, k or cfg.k)


def _match_hits(spark: SparkSession, out_dir: str,
                queries: DataFrame) -> DataFrame:
    """Hit set of an ES ``match`` query over the stored index: distinct
    (query_id, doc_id) where the doc contains ≥1 query term — candidates
    come from the term-pruned postings scan, never a corpus scan."""
    stats = read_stats_json(out_dir)
    qt = query_terms(queries, code_aware=stats.get("code_aware", False))
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    tf = decompress_blocks(load_blocks(spark, out_dir, terms))
    return (tf.join(F.broadcast(qt), "term")
            .select("query_id", "doc_id").distinct())


def sorted_topk(spark: SparkSession, out_dir: str, queries: DataFrame,
                sort_field: str, ascending: bool = False,
                k: int = 10,
                after: dict[int, tuple] | None = None) -> DataFrame:
    """ES sort-by-field over the stored index (``"sort": [{field:
    desc}]``): the match hit set ordered by a docs-table metadata field
    with doc_id tie-break, composing with ``search_after`` pagination.

    Plan shape: term-pruned postings give the hits; the sort field comes
    from the content-free ``docs/`` table (column-pruned scan) via a
    doc_id-keyed join (AQE picks the strategy — the hit set of a broad
    query is NOT broadcastable); the ranking is the salted two-phase
    window in :func:`operators.bm25.sort_topk`."""
    from dp_search_data_importer_spark.operators.bm25 import sort_topk

    hits = _match_hits(spark, out_dir, queries)
    meta = spark.read.parquet(os.path.join(out_dir, "docs")).select(
        "doc_id", sort_field)
    return sort_topk(hits.join(meta, "doc_id"), sort_field, k,
                     ascending=ascending, after=after)


def facet_counts(spark: SparkSession, out_dir: str, queries: DataFrame,
                 facet_fields: list[str], top_n: int = 5) -> DataFrame:
    """ES query-scoped ``terms`` aggregations (facets) over the stored
    index: bucket counts of metadata fields across each query's full hit
    set — the aggregation side of faceted search. Hit set and metadata
    access follow the same pruned-scan discipline as :func:`sorted_topk`."""
    from dp_search_data_importer_spark.operators.bm25 import facet_terms

    hits = _match_hits(spark, out_dir, queries)
    meta = spark.read.parquet(os.path.join(out_dir, "docs")).select(
        "doc_id", *facet_fields)
    return facet_terms(hits, meta, facet_fields, top_n=top_n)


def sliced_scroll(spark: SparkSession, out_dir: str, text: str,
                  n_slices: int, *, operator: str = "or",
                  resolve: bool = True) -> DataFrame:
    """ES sliced scroll twin — the parallel-export path: the FULL match
    hit set (not top-k) split into ``n_slices`` independent slices by
    ``slice_id = pmod(doc_id, max)`` (ES slices a scroll by a hash of
    ``_id`` mod ``max``; pmod on the already-hashed doc_id is the same
    contract: disjoint, exhaustive, uniform). Each slice is internally
    ordered by doc_id, so a consumer can checkpoint/resume a slice with a
    strict-after cursor exactly like ``search_after``.

    This is the operator a 10^12-file export runs instead of deep
    pagination: slices are embarrassingly parallel (no coordination, no
    global sort, no window), the matching side is the same term-pruned
    postings scan every query uses, and ``resolve=True`` joins the winners
    to the content-free docs table for (repo, path, commit) — column
    pruned, AQE-planned. Contrast: ``search_after`` serializes the scan
    through one cursor chain; N slices divide the wall-clock by N."""
    from dp_search_data_importer_spark.plans.update_index import match_ids

    if n_slices < 1:
        raise ValueError("n_slices must be >= 1")
    ids = match_ids(spark, out_dir, text, operator=operator)
    if ids is None:
        raise ValueError(f"query tokenizes to nothing: {text!r}")
    out = ids.withColumn(
        "slice_id", F.pmod(F.col("doc_id"), F.lit(int(n_slices))).cast("int"))
    if resolve:
        # NOT resolve_docs: that broadcasts its input (right for a top-k
        # winner set, wrong for a full export hit set — a broad query's
        # hits are corpus-sized). Plain doc_id equi-join; AQE plans it.
        docs = spark.read.parquet(os.path.join(out_dir, "docs")).select(
            "doc_id", "repo", "path", "commit", "lang")
        out = out.join(docs, "doc_id")
    return out.repartition(n_slices, "slice_id") \
        .sortWithinPartitions("slice_id", "doc_id")


def explain_score(spark: SparkSession, out_dir: str, text: str,
                  doc_id: int, cfg: EngineConfig | None = None) -> DataFrame:
    """ES ``GET /index/_explain/{id}`` twin: the per-term BM25 breakdown
    of one document's score for one query — (term, tf, dl, df, idf,
    tf_norm, contribution), contributions summing to the document's
    ``exact_topk`` score (same formula, same statistics). The plan is the
    standard term-pruned postings scan PLUS a doc_id pushdown, so the
    explain of one doc reads only the blocks holding (query term, that
    doc) — never the hit set."""
    cfg = cfg or EngineConfig()
    from dp_search_data_importer_spark.operators.bm25 import (
        bm25_term_score,
        query_terms,
    )

    stats_sdf, stats = _stats_df(spark, out_dir)
    from dp_search_data_importer_spark.session import local_df

    queries = local_df(spark, [(0, text)],
                       "query_id long, query_text string")
    qt = query_terms(queries, code_aware=stats.get("code_aware", False))
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    tf = decompress_blocks(load_blocks(spark, out_dir, terms)).filter(
        F.col("doc_id") == int(doc_id))
    dfs = spark.read.parquet(os.path.join(out_dir, "term_df")).filter(
        F.col("term").isin(terms))
    n_docs, avgdl = F.lit(stats["n_docs"]), F.lit(stats["avgdl"])
    idf = F.log(F.lit(1.0) + (n_docs - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_norm = (F.col("tf").cast("double") * F.lit(cfg.k1 + 1.0)
               / (F.col("tf").cast("double") + F.lit(cfg.k1)
                  * (F.lit(1.0 - cfg.b)
                     + F.lit(cfg.b) * F.col("dl").cast("double") / avgdl)))
    return (tf.join(F.broadcast(dfs), "term")
            .select("term", "tf", "dl", "df",
                    F.round(idf, 6).alias("idf"),
                    F.round(tf_norm, 6).alias("tf_norm"),
                    F.round(bm25_term_score(
                        F.col("tf"), F.col("dl"), F.col("df"),
                        n_docs, avgdl, cfg), 6).alias("contribution"))
            .orderBy("term"))
