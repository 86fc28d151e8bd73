"""Per-partition checkpoint manifest (north_rule: resumable build with
per-partition lineage + metrics).

Analogue of the reference's commit semantics: the Kafka consumer commits
offsets only after a batch is fully handled (at-least-once,
``/root/reference/handler/handler.go`` returns error → no commit), and the
write is an idempotent keyed upsert so redelivery is safe. Here the unit of
commit is an index *shard wave*: a wave's shards are built deterministically,
written, verified by read-back, and only then recorded in the manifest. On
restart, completed shards are skipped (anti-join against the manifest) and the
deterministic build makes re-execution of incomplete waves idempotent —
the same effectively-once result.

Metrics mirror A9's accounting (``handler/handler.go:96-128`` counts
documents_received / documents_inserted): per shard we record docs, postings,
blocks, compressed bytes, plus an order-independent content fingerprint
(bit_xor of block hashes) used by the kill-and-resume identity test.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_COLS = ("shard", "n_docs", "n_postings", "n_blocks",
                 "bytes_compressed", "content_fingerprint")


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame | None:
    p = manifest_path(out_dir)
    if not os.path.exists(p) or not any(
        f.endswith(".parquet") for f in os.listdir(p)
    ):
        return None
    return spark.read.parquet(p)


def completed_shards(spark: SparkSession, out_dir: str) -> set[int]:
    m = read_manifest(spark, out_dir)
    if m is None:
        return set()
    return {r["shard"] for r in m.select("shard").distinct().collect()}


def shard_metrics(blocks: DataFrame) -> DataFrame:
    """Aggregate written block rows into per-shard manifest rows. Runs on the
    *read-back* of what landed on disk, so the manifest certifies disk state,
    not intent."""
    # xxhash64 skips null inputs, so including poss keeps position-free
    # indexes' fingerprints unchanged while certifying position bytes when
    # the index is positional
    block_hash = F.xxhash64(
        "term", "first_doc_id", "doc_gaps", "tfs", "dls", "poss"
    )
    return blocks.groupBy("shard").agg(
        F.sum("n_docs").cast("long").alias("n_postings"),
        F.count(F.lit(1)).alias("n_blocks"),
        (
            F.sum(F.length("doc_gaps")) + F.sum(F.length("tfs"))
            + F.sum(F.length("dls"))
            + F.coalesce(F.sum(F.length("poss")), F.lit(0))
        ).cast("long").alias("bytes_compressed"),
        F.bit_xor(block_hash).alias("content_fingerprint"),
        F.count_distinct("term").alias("n_terms"),
    )


def append_manifest(rows: DataFrame, out_dir: str) -> None:
    rows.write.mode("append").parquet(manifest_path(out_dir))


def write_stats_json(out_dir: str, stats: dict) -> None:
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=2, sort_keys=True)


def read_stats_json(out_dir: str) -> dict:
    # roll an interrupted upsert commit forward BEFORE serving stats:
    # stats.json is the last artifact swapped, so a mid-commit crash
    # otherwise leaves new shards scored with stale N/avgdl (one
    # os.path.exists when no marker is present; local import — this
    # module has no plan-level deps)
    from dp_search_data_importer_spark.plans.update_index import (
        recover_for_read,
    )

    recover_for_read(out_dir)
    with open(os.path.join(out_dir, "stats.json")) as f:
        return json.load(f)
