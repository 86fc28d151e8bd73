"""spark-submit entry point: the training-data curation pass.

    zip -r dp_search_data_importer_spark.zip dp_search_data_importer_spark
    spark-submit --py-files dp_search_data_importer_spark.zip \
        scripts/curate.py --source /path/to/documents_parquet \
        --out /path/to/curated --text-col text --id-col doc_id \
        --keep-langs en,de,fr --near-dedup

Pipeline (each stage is the operator a 100 TB pre-training corpus runs):

1. ``curation_verdicts`` — language gate + quality bands + PII screen +
   repetition screen fused into ONE projection (single corpus scan);
   rejected docs land under ``<out>/rejected/`` with their reasons.
2. exact dedup (``dedup_exact``) — one hash-groupBy pass.
3. optional transitive near-dedup (``--near-dedup``): MinHash-LSH pair
   graph → connected components → keep the min-id representative per
   cluster.

Outputs: ``<out>/kept/`` (curated docs), ``<out>/rejected/`` (doc_id +
reasons), ``<out>/_curation_metrics.json`` (per-stage accounting — the A9
reconciliation discipline applied to curation).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="documents table path")
    ap.add_argument("--source-format", default="parquet",
                    choices=["parquet", "iceberg"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--keep-langs", default="en",
                    help="comma-separated lang codes the language gate keeps")
    ap.add_argument("--min-quality", type=float, default=0.7)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.3)
    ap.add_argument("--near-dedup", action="store_true",
                    help="also run transitive MinHash-LSH near-dedup")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dp_search_data_importer_spark.operators.dedup import (
        dedup_exact,
        near_dup_clusters,
    )
    from dp_search_data_importer_spark.operators.textstats import (
        curation_verdicts,
    )
    from dp_search_data_importer_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="curate")
    if args.source_format == "iceberg":
        docs = spark.read.format("iceberg").load(args.source)
    else:
        docs = spark.read.parquet(args.source)

    n_in = docs.count()
    verdicts = curation_verdicts(
        docs, text_col=args.text_col, id_col=args.id_col,
        keep_langs=tuple(args.keep_langs.split(",")),
        min_quality=args.min_quality,
        max_dup_line_frac=args.max_dup_line_frac,
    )
    (verdicts.filter(F.col("keep") == 0)
     .select("doc_id", "lang_guess", "quality_score", "pii_total",
             "dup_line_frac", "reasons")
     .write.mode("overwrite").parquet(os.path.join(args.out, "rejected")))
    keep_ids = verdicts.filter(F.col("keep") == 1).select(
        F.col("doc_id").alias(args.id_col))
    kept = docs.join(keep_ids, args.id_col, "left_semi")
    n_screened = kept.count()

    kept = dedup_exact(kept, text_col=args.text_col, id_col=args.id_col)
    n_exact = kept.count()

    n_near = n_exact
    if args.near_dedup:
        clusters = near_dup_clusters(kept, text_col=args.text_col,
                                     id_col=args.id_col)
        reps = clusters.filter(
            F.col("doc_id") == F.col("cluster_id")).select(
            F.col("doc_id").alias(args.id_col))
        kept = kept.join(reps, args.id_col, "left_semi")
        n_near = kept.count()

    kept.write.mode("overwrite").parquet(os.path.join(args.out, "kept"))
    metrics = {
        "documents_received": int(n_in),
        "after_screens": int(n_screened),
        "after_exact_dedup": int(n_exact),
        "after_near_dedup": int(n_near),
        "kept_fraction": round(n_near / n_in, 4) if n_in else 0.0,
    }
    with open(os.path.join(args.out, "_curation_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, sort_keys=True)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
