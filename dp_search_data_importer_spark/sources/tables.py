"""Parquet table loaders for the driver testdata (TESTDATA.md).

Batch analogue of the reference's Kafka stream source (A1,
``/root/reference/service/initialise.go:41-66``): in production the engine
reads an Iceberg ``repo_files`` table; in the sandbox, parquet directories.
The loader is format-abstracted so Iceberg (``spark.read.format("iceberg")``)
is a drop-in when the runtime jar is present (SURVEY.md §7 hard part c).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Column pruning + predicate pushdown reach the
    parquet scan because this returns the raw declarative reader result."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return spark.read.parquet(path)


def load_documents(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return load_table(spark, sf_dir, "documents")
