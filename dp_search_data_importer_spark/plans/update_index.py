"""Incremental index upsert — the reference's continuous-import semantics
applied to the native index.

The reference's whole job is a forever-stream of documents keyed by uid
flowing into the search index as idempotent upserts
(``/root/reference/handler/handler.go:133-155`` ``doc_as_upsert``); its index
maintenance is delegated to Elasticsearch. This module is the Spark-native
equivalent for OUR index: a batch of new/changed documents updates the
sharded postings WITHOUT touching unaffected shards.

Design (all shard-local, batch-proportional):

1. new docs hash to shards exactly like the build; only those shards'
   postings are read back (decompress_blocks) — the rest of the index is
   never scanned;
2. replaced docs' rows are dropped (keyed last-writer-wins, like
   ``doc_as_upsert``), the batch's tf rows union in, and the affected
   shards recompress deterministically — the SAME sort + block layout as a
   fresh build, so the result is byte-identical to rebuilding the merged
   corpus from scratch (property-tested);
3. corpus statistics update by exact integer deltas (n_docs, Σdl, per-term
   df). Block metadata is avgdl-free (impacts — see
   ``build_index.block_impacts``), so a drifting avgdl never invalidates
   bounds baked into untouched shards; queries always score with the
   CURRENT stats, exactly like Lucene applying norms at search time;
4. the merged tf and docs rows are STAGED to temp parquet before the
   dynamic partition overwrite — the job never overwrites storage its own
   plan still reads (same crash-safety discipline as
   streaming.ingest_stream.upsert_batch).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.checkpoint import (
    read_stats_json,
    shard_metrics,
    write_stats_json,
)
from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.operators.ingest import normalize_repo_files
from dp_search_data_importer_spark.plans.build_index import (
    BLOCKS_SCHEMA,
    _compress_runs,
    tokenize_docs,
)
from dp_search_data_importer_spark.plans.query import (
    decompress_blocks,
    load_blocks,
)


def upsert_docs(
    spark: SparkSession,
    out_dir: str,
    new_docs: DataFrame,
    *,
    already_normalized: bool = False,
    tokenizer: str = "arrow",
    text_col: str = "content",
) -> dict:
    """Apply a batch of new/changed documents to the index at ``out_dir``.

    Keyed upsert on doc_id (an existing doc with the same id is replaced;
    duplicates within the batch collapse to one row). Returns accounting:
    {received, upserted, replaced, added, affected_shards} — the A9 twin.
    """
    stats = read_stats_json(out_dir)
    cfg = EngineConfig(n_shards=stats["n_shards"],
                       block_size=stats["block_size"],
                       k1=stats["k1"], b=stats["b"])
    code_aware = bool(stats.get("code_aware", False))

    batch = new_docs if already_normalized else normalize_repo_files(new_docs)
    batch = batch.dropDuplicates(["doc_id"]).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
    )
    received = new_docs.count()

    # stage the batch once (several consumers: ids, tf, docs rows)
    batch_tmp = os.path.join(out_dir, "_upsert_batch")
    batch.write.mode("overwrite").parquet(batch_tmp)
    batch = spark.read.parquet(batch_tmp)
    try:
        affected = sorted(
            r["shard"] for r in batch.select("shard").distinct().collect()
        )
        if not affected:
            return {"received": int(received), "upserted": 0, "replaced": 0,
                    "added": 0, "affected_shards": []}
        new_ids = batch.select("doc_id")

        # ---- old state of the affected shards only
        old_tf = decompress_blocks(
            load_blocks(spark, out_dir).filter(F.col("shard").isin(affected))
        ).withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
        )
        docs_store = spark.read.parquet(os.path.join(out_dir, "docs"))
        old_docs = docs_store.filter(F.col("shard").isin(affected))
        n_replaced = old_docs.join(new_ids, "doc_id", "left_semi").count()

        removed_tf = old_tf.join(new_ids, "doc_id", "left_semi")
        kept_tf = old_tf.join(new_ids, "doc_id", "left_anti")
        new_tf = tokenize_docs(
            batch, code_aware=code_aware, text_col=text_col,
            tokenizer=tokenizer,
        ).withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
        )

        # ---- exact integer stat deltas (one small agg each, over
        # batch/affected-shard-sized data only)
        removed_sum_dl = removed_tf.agg(F.sum("tf")).collect()[0][0] or 0
        new_sum_dl = new_tf.agg(F.sum("tf")).collect()[0][0] or 0
        # df deltas are STAGED before the postings overwrite below — their
        # lineage reads the old postings files, which cease to exist after
        # the dynamic overwrite (batch-proportional tables, cheap writes)
        deltas_tmp = os.path.join(out_dir, "_upsert_df_deltas")
        (removed_tf.groupBy("term").agg(F.count(F.lit(1)).alias("removed"))
         .write.mode("overwrite").parquet(os.path.join(deltas_tmp, "removed")))
        (new_tf.groupBy("term").agg(F.count(F.lit(1)).alias("added"))
         .write.mode("overwrite").parquet(os.path.join(deltas_tmp, "added")))
        removed_df = spark.read.parquet(os.path.join(deltas_tmp, "removed"))
        added_df = spark.read.parquet(os.path.join(deltas_tmp, "added"))

        # ---- stage merged tf, then recompress ONLY the affected shards
        merged_tmp = os.path.join(out_dir, "_upsert_tf")
        kept_tf.unionByName(new_tf).write.mode("overwrite").parquet(merged_tmp)
        merged = spark.read.parquet(merged_tmp)
        sorted_runs = merged.repartition(
            len(affected), "shard"
        ).sortWithinPartitions("shard", "term", "doc_id")
        blocks = sorted_runs.mapInPandas(
            lambda it: _compress_runs(it, cfg.block_size),
            schema=BLOCKS_SCHEMA,
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (blocks.write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(out_dir, "postings")))

        # ---- docs/: replaced rows out, batch rows in (affected shards only)
        doc_cols = [c for c in docs_store.columns if c != "shard"] + ["shard"]
        batch_doc_rows = batch.select(
            *[c for c in doc_cols if c in batch.columns])
        kept_docs = old_docs.join(new_ids, "doc_id", "left_anti").select(
            *batch_doc_rows.columns)
        docs_tmp = os.path.join(out_dir, "_upsert_docs")
        kept_docs.unionByName(batch_doc_rows).write.mode(
            "overwrite").parquet(docs_tmp)
        (spark.read.parquet(docs_tmp)
         .repartition(len(affected), "shard")
         .write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(out_dir, "docs")))

        # ---- term_df: exact df deltas, staged swap (small table)
        term_df_dir = os.path.join(out_dir, "term_df")
        old_df = spark.read.parquet(term_df_dir)
        updated_df = (
            old_df.join(removed_df, "term", "full")
            .join(added_df, "term", "full")
            .select(
                "term",
                (F.coalesce(F.col("df"), F.lit(0))
                 - F.coalesce(F.col("removed"), F.lit(0))
                 + F.coalesce(F.col("added"), F.lit(0))).alias("df"),
            )
            .filter(F.col("df") > 0)
        )
        df_tmp = os.path.join(out_dir, "_upsert_term_df")
        updated_df.write.mode("overwrite").parquet(df_tmp)
        shutil.rmtree(term_df_dir)
        os.rename(df_tmp, term_df_dir)

        # ---- stats.json + manifest
        n_new = batch.count()
        per_shard_new = {
            int(r["shard"]): int(r["n"]) for r in
            spark.read.parquet(os.path.join(out_dir, "docs"))
            .filter(F.col("shard").isin(affected))
            .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        shard_docs = {int(k): int(v)
                      for k, v in stats.get("shard_docs", {}).items()}
        shard_docs.update(per_shard_new)
        n_docs = stats["n_docs"] + n_new - n_replaced
        sum_dl = int(stats.get("sum_dl",
                               round(stats["avgdl"] * stats["n_docs"])))
        sum_dl += int(new_sum_dl) - int(removed_sum_dl)
        stats.update({
            "n_docs": int(n_docs),
            "sum_dl": int(sum_dl),
            "avgdl": float(sum_dl / n_docs) if n_docs else 0.0,
            "shard_docs": shard_docs,
        })
        write_stats_json(out_dir, stats)

        manifest_dir = os.path.join(out_dir, "_manifest")
        old_manifest = spark.read.parquet(manifest_dir).filter(
            ~F.col("shard").isin(affected))
        written = spark.read.parquet(
            os.path.join(out_dir, "postings")
        ).filter(F.col("shard").isin(affected))
        ndocs_expr = F.coalesce(
            *[F.when(F.col("shard") == s, F.lit(shard_docs.get(s, 0)))
              for s in affected],
            F.lit(0),
        )
        new_rows = shard_metrics(written).select(
            "shard", ndocs_expr.cast("long").alias("n_docs"),
            "n_postings", "n_blocks", "bytes_compressed",
            "content_fingerprint", "n_terms",
        )
        man_tmp = os.path.join(out_dir, "_upsert_manifest")
        old_manifest.unionByName(new_rows).write.mode(
            "overwrite").parquet(man_tmp)
        shutil.rmtree(manifest_dir)
        os.rename(man_tmp, manifest_dir)

        return {"received": int(received), "upserted": int(n_new),
                "replaced": int(n_replaced),
                "added": int(n_new - n_replaced),
                "affected_shards": affected}
    finally:
        for tmp in ("_upsert_batch", "_upsert_tf", "_upsert_docs",
                    "_upsert_term_df", "_upsert_manifest",
                    "_upsert_df_deltas"):
            shutil.rmtree(os.path.join(out_dir, tmp), ignore_errors=True)
