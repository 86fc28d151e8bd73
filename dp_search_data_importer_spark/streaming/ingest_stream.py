"""Structured Streaming ingestion — the reference's Kafka micro-batch path
re-expressed (SURVEY.md §2 A1/A2/A8).

Reference semantics carried over:
- micro-batches bounded by count/time (``config/config.go:60-61`` BATCH_SIZE
  500 / BATCH_WAIT_TIME 5 s) → ``trigger(processingTime=…)`` +
  ``maxOffsetsPerTrigger`` on a Kafka source; file source + availableNow in
  the sandbox (no broker here);
- at-least-once delivery + **idempotent keyed upsert** ⇒ effectively-once
  (``handler/handler.go:146-150`` ``doc_as_upsert``): ``upsert_batch`` is a
  deterministic last-writer-wins MERGE keyed on ``uid``, safe under batch
  replay — re-delivering any batch yields a byte-identical store;
- handler error ⇒ no offset commit ⇒ redelivery: Structured Streaming's
  checkpoint gives the same contract (``checkpointLocation``).

The store is hash-bucketed parquet with dynamic partition overwrite — the
sandbox stand-in for an Iceberg ``MERGE INTO`` (only touched buckets are
rewritten; bucket count scales the rewrite granularity).

In production the source line is:
    spark.readStream.format("kafka")
         .option("subscribe", "search-data-import")
         .option("startingOffsets", "earliest")        # offset=oldest (A1)
         .option("maxOffsetsPerTrigger", 500 * n_partitions)
and the Avro payload decodes with ``from_avro(col("value"), schema_json)``
(A3) — same downstream code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BUCKETS = 16


def _bucket(uid_col):
    return F.pmod(F.xxhash64(uid_col), F.lit(N_BUCKETS)).cast("int")


def upsert_batch(batch: DataFrame, store_dir: str, key: str = "uid") -> None:
    """Idempotent keyed upsert of one micro-batch into the bucketed store.

    Last-writer-wins within the batch (highest ``seq`` if present), then the
    batch overrides the store. Only buckets touched by the batch are
    rewritten (dynamic partition overwrite) — the Iceberg MERGE INTO
    analogue at parquet level.
    """
    spark = batch.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    batch = batch.withColumn("bucket", _bucket(F.col(key)))
    if "seq" in batch.columns:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key).orderBy(F.col("seq").desc())
        batch = (batch.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))
    else:
        batch = batch.dropDuplicates([key])

    exists = os.path.exists(store_dir) and any(
        f.startswith("bucket=") for f in os.listdir(store_dir)
    )
    if exists:
        touched = [r["bucket"] for r in
                   batch.select("bucket").distinct().collect()]
        existing = (
            spark.read.parquet(store_dir)
            .filter(F.col("bucket").isin(touched))
            .join(batch.select(key), key, "left_anti")  # batch wins
        )
        from pyspark import StorageLevel

        combined = existing.unionByName(batch)
        # materialize fully (memory+disk: survives eviction) BEFORE
        # overwriting the very partitions being read — with Iceberg this
        # whole dance is a single transactional MERGE INTO
        combined = combined.persist(StorageLevel.MEMORY_AND_DISK)
        combined.count()
        (combined.repartition(len(touched), "bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(store_dir))
        combined.unpersist()
    else:
        (batch.repartition(N_BUCKETS, "bucket")
         .write.mode("overwrite").partitionBy("bucket").parquet(store_dir))


def run_ingest_stream(
    events: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key: str = "uid",
    available_now: bool = True,
    processing_time: str = "5 seconds",
):
    """events (streaming DF) → foreachBatch idempotent upsert. Returns the
    StreamingQuery. ``available_now`` drains bounded input then stops (test
    mode); otherwise the reference's 5 s micro-batch cadence applies."""
    writer = (
        events.writeStream
        .foreachBatch(lambda df, _id: upsert_batch(df, store_dir, key))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window rollup — the stateful-streaming operator
    the reference never needed (idempotent upsert made late data moot,
    SURVEY.md §2 note); ours supports it for event analytics. Works on both
    streaming and batch DataFrames (same expression)."""
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window_dur).alias("win"),
                    F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             .alias("sum_value"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "event_type", "n_events", "sum_value")
    )
