"""Driver contract for the spark-graft builder (PySpark target).

Thin shell over ``dp_search_data_importer_spark.plans.driver_queries`` —
every implemented operator from SURVEY.md §2 registers a (query, oracle)
pair there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dp_search_data_importer_spark.plans import driver_queries as _dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact BM25 top-10 over the reference query set at sf0.001."""
    return _dq.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_dq.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_dq.ORACLES)
