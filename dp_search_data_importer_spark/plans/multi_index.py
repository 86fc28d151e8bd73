"""Search across MANY stored indexes — the alias / index-per-day pattern.

A 10^12-file corpus is not one index: production deployments partition
it (per day, per source, per repo ring) and search an alias that fans
out to every member index. This module is that fan-out for the stored
on-disk indexes this engine builds: the per-index term-pruned postings
scans union into ONE frame, statistics join per-index or merged
(:mod:`operators.federate`), and the coordinating merge is the same
single windowed top-k as a one-index search. Adding an index to the
"alias" adds one more pruned parquet scan — no rebuild, no re-shuffle of
existing members, which is exactly why the pattern exists at scale:
ingest writes only today's index; history is immutable.

Scale notes: per-index stats.json reads are O(#indexes) driver-side file
reads (thousands at most — bounded by topology, not data); term_df scans
are term-pruned pushed-down parquet reads; the candidate union preserves
per-scan partitioning (union is plan-level, not a shuffle).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.checkpoint import read_stats_json
from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.operators.bm25 import query_terms
from dp_search_data_importer_spark.operators.federate import (
    INDEX_COL,
    federated_scores,
    federated_topk,
)
from dp_search_data_importer_spark.plans.query import (
    decompress_blocks,
    load_blocks,
)


def search_indices(spark: SparkSession, index_dirs: list[str],
                   queries: DataFrame, cfg: EngineConfig | None = None,
                   k: int | None = None,
                   mode: str = "query_then_fetch",
                   indices_boost: dict[str, float] | None = None,
                   ) -> DataFrame:
    """Top-k BM25 across ``index_dirs`` (the alias members), returning
    (query_id, index_name, doc_id, score). ``mode`` is the ES search
    type: ``query_then_fetch`` scores with each index's own statistics
    (the ES default); ``dfs_query_then_fetch`` scores with merged global
    statistics and is rank-identical to a single index holding the whole
    corpus (property-tested). Index names are the directory basenames
    and must be unique. All members must share the analyzer
    (stats.json ``code_aware``) — analyzer asymmetry across alias
    members is refused loudly, as mixed-analyzer aliases silently
    mis-tokenize in ES too.
    """
    if not index_dirs:
        raise ValueError("search_indices needs at least one index dir")
    cfg = cfg or EngineConfig()
    names = [os.path.basename(os.path.normpath(d)) for d in index_dirs]
    if len(set(names)) != len(names):
        raise ValueError(f"alias members must have unique names: {names}")

    all_stats = [read_stats_json(d) for d in index_dirs]
    aware = {bool(s.get("code_aware", False)) for s in all_stats}
    if len(aware) > 1:
        raise ValueError(
            "alias members disagree on the analyzer (code_aware); "
            "refusing a mixed-analyzer search")

    qt = query_terms(queries, code_aware=aware.pop())
    terms = [r["term"] for r in qt.select("term").distinct().collect()]

    from dp_search_data_importer_spark.session import local_df
    stats = local_df(
        spark,
        [(n, s["n_docs"], s["avgdl"]) for n, s in zip(names, all_stats)],
        f"{INDEX_COL} string, n_docs long, avgdl double")

    tf = None
    dfs = None
    for name, d in zip(names, index_dirs):
        part_tf = decompress_blocks(load_blocks(spark, d, terms)) \
            .withColumn(INDEX_COL, F.lit(name))
        part_df = (spark.read.parquet(os.path.join(d, "term_df"))
                   .filter(F.col("term").isin(terms))
                   .withColumn(INDEX_COL, F.lit(name)))
        tf = part_tf if tf is None else tf.unionByName(part_tf)
        dfs = part_df if dfs is None else dfs.unionByName(part_df)

    scores = federated_scores(tf, qt, dfs, stats, cfg, mode=mode)
    if indices_boost:
        from dp_search_data_importer_spark.operators.federate import (
            apply_indices_boost,
        )

        unknown = set(indices_boost) - set(names)
        if unknown:
            raise ValueError(
                f"indices_boost names not in the alias: {sorted(unknown)}")
        scores = apply_indices_boost(scores, indices_boost)
    return federated_topk(scores, k or cfg.k)
