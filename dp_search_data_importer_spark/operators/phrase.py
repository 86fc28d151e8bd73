"""Phrase queries (ES ``match_phrase`` twin) over a positional sidecar.

The reference's Elasticsearch index stores term positions and answers
phrase queries by verifying adjacency; this module is the Spark-native
equivalent, kept as an OPTIONAL sidecar table next to the main index so the
block codec stays position-free:

  positions/   (shard, term, doc_id, positions array<int>, dl)
               parquet partitioned by shard; term filter pushes into the
               scan exactly like the postings table.

Phrase evaluation is pure Catalyst set algebra — no Python on the data
path: for tokens t1..tn, S1 = positions(t1) and
S_{i+1} = array_intersect(transform(S_i, p → p+1), positions(t_{i+1}));
a doc matches iff S_n is non-empty, and |S_n| is the phrase term frequency.
Scoring is standard BM25 with tf = phrase_tf and df = phrase document
frequency (computed on the matched set), N/avgdl from the index stats —
the same formula Lucene applies to phrase frequencies.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.functions.tokenize import (
    tokenize_code_expr,
    tokenize_expr,
)


def doc_positions(docs: DataFrame, *, code_aware: bool = False,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term, positions array<int>, dl) — sorted 0-based token
    positions per (doc, term), dl alongside so phrase scoring never joins
    the docs table (same discipline as the postings blocks)."""
    tok = tokenize_code_expr if code_aware else tokenize_expr
    toks = docs.select(F.col(id_col).alias("doc_id"), tok(text_col).alias("t"))
    exploded = toks.select(
        "doc_id", F.size("t").cast("long").alias("dl"),
        F.posexplode("t").alias("p", "term"),
    )
    return (
        exploded.groupBy("doc_id", "dl", "term")
        .agg(F.sort_array(F.collect_list("p")).alias("positions"))
        .select("doc_id", "term", "positions", "dl")
    )


def build_positions(spark: SparkSession, docs: DataFrame, out_dir: str,
                    cfg: EngineConfig | None = None, *,
                    code_aware: bool = True,
                    text_col: str = "content") -> None:
    """Write the positional sidecar under ``<index>/positions`` —
    shard-partitioned like the postings (one task per shard dir)."""
    cfg = cfg or EngineConfig()
    pos = doc_positions(docs, code_aware=code_aware,
                        text_col=text_col).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int"))
    (pos.repartition(cfg.n_shards, "shard")
     .write.mode("overwrite").partitionBy("shard")
     .parquet(os.path.join(out_dir, "positions")))


def phrase_matches(pos: DataFrame, tokens: list[str]) -> DataFrame:
    """(doc_id, phrase_tf, dl) for docs containing the exact token sequence.
    Handles repeated tokens in the phrase (each position joins its own
    filtered slice). Every join is on doc_id over term-filtered (tiny)
    slices; the set algebra runs as Catalyst array expressions."""
    cur = (
        pos.filter(F.col("term") == tokens[0])
        .select("doc_id", "dl", F.col("positions").alias("s"))
    )
    for i, t in enumerate(tokens[1:], start=1):
        nxt = pos.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"_p{i}"))
        cur = (
            cur.join(nxt, "doc_id")
            .withColumn(
                "s",
                F.array_intersect(
                    F.transform("s", lambda p: p + 1), F.col(f"_p{i}")),
            )
            .drop(f"_p{i}")
            .filter(F.size("s") > 0)
        )
    return cur.select("doc_id", F.size("s").cast("long").alias("phrase_tf"),
                      "dl")


def phrase_score(matches: DataFrame, n_docs: int, avgdl: float,
                 cfg: EngineConfig | None = None) -> DataFrame:
    """BM25 over phrase frequencies: df = |matched docs| (exact, from the
    match set itself — ES/Lucene uses an approximation here; exact is
    strictly better and cheap because the matched set is small)."""
    cfg = cfg or EngineConfig()
    df_count = matches.count()
    if df_count == 0:
        return matches.sparkSession.createDataFrame(
            [], "doc_id long, score double")
    idf = math.log(1.0 + (n_docs - df_count + 0.5) / (df_count + 0.5))
    tf = F.col("phrase_tf").cast("double")
    norm = tf + cfg.k1 * ((1.0 - cfg.b)
                          + cfg.b * F.col("dl").cast("double") / avgdl)
    return matches.select(
        "doc_id",
        (F.lit(idf) * tf * F.lit(cfg.k1 + 1.0) / norm).alias("score"),
    )


def phrase_topk(spark: SparkSession, out_dir: str,
                phrases: list[tuple[int, str]],
                cfg: EngineConfig | None = None,
                k: int = 10) -> DataFrame:
    """(query_id, doc_id, score) top-k per phrase over the positional
    sidecar; analyzer symmetry with the index (stats.json code_aware),
    rounded-score deterministic ranking like every other query path."""
    from dp_search_data_importer_spark.checkpoint import read_stats_json
    from dp_search_data_importer_spark.operators.bm25 import topk

    cfg = cfg or EngineConfig()
    stats = read_stats_json(out_dir)
    # tokenize each phrase through the same analyzer (driver-side literal)
    from dp_search_data_importer_spark.functions.tokenize import (
        _code_tokens_py,
        _simple_tokens_py,
    )

    tok_py = _code_tokens_py if stats.get("code_aware") else _simple_tokens_py
    all_terms = sorted({
        t for _, p in phrases for t in tok_py(p)
    })
    pos = spark.read.parquet(os.path.join(out_dir, "positions")).filter(
        F.col("term").isin(all_terms))
    outs = []
    for qid, phrase in phrases:
        tokens = tok_py(phrase)
        if not tokens:
            continue
        m = phrase_matches(pos, tokens)
        scored = phrase_score(m, stats["n_docs"], stats["avgdl"], cfg)
        outs.append(scored.select(F.lit(qid).cast("long").alias("query_id"),
                                  "doc_id", "score"))
    if not outs:
        from dp_search_data_importer_spark.session import local_df

        return local_df(spark, [], "query_id long, doc_id long, score double")
    union = outs[0]
    for o in outs[1:]:
        union = union.unionByName(o)
    return topk(union, k)
