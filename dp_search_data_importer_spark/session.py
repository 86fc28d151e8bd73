"""SparkSession builder.

Local-mode defaults tuned for the sandbox (local[N] on a 32-core, 128 GiB
host); on a real cluster the same code runs under ``spark-submit --py-files``
with these conf keys supplied externally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "dp-search-data-importer-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on: runtime coalescing + skew-join splitting complement the engine's
      explicit salting/sharding at scale.
    - Arrow on: every Python touchpoint in this engine is a vectorized
      pandas/Arrow UDF (input_hint: "no per-row Python").
    """
    # Executors' Python workers must be able to import this package: its UDF
    # closures are cloudpickled by reference. In local mode the workers
    # inherit PYTHONPATH from the driver process env (set it BEFORE the JVM
    # starts); on a real cluster ship the package with
    # ``spark-submit --py-files dp_search_data_importer_spark.zip`` instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )

    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism, not the 200 default (local mode: tiny partitions
        # just add scheduling overhead; cluster mode: set via spark-submit).
        try:
            n = int(master.split("[")[1].rstrip("]")) if "[" in master else 32
        except ValueError:
            n = os.cpu_count() or 32
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # console progress bars interleave \r with CLI stdout, clobbering
        # result lines (observed twice while verifying scripts/query.py)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # note: zstd for parquet/shuffle was measured on this host and was
        # noise-neutral vs snappy/lz4 (varint-compressed blocks + short-string
        # columns don't gain enough to beat the extra CPU in python-contended
        # stages); defaults kept. On cluster object stores revisit zstd.
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_LOCAL_DF_CACHE: dict[tuple, object] = {}


def local_df(spark: SparkSession, rows: list[tuple], schema: str):
    """Small driver-side table → DataFrame via the pandas/Arrow path.

    ``spark.createDataFrame(list_of_tuples)`` builds a Python-RDD-backed plan
    with defaultParallelism slices — its first execution forks a Python worker
    per slice (measured ~20 s of pure worker boot on local[32] right after a
    heavy job). The pandas route converts once through Arrow into a JVM
    ``LocalTableScan``: no Python at execution time, one partition.

    The constructed frame is memoized per (session, schema, rows): these
    are immutable literal PLANS (a LocalTableScan is its data), and query
    paths rebuild the same few literal tables (query sets, clause specs)
    on every call — the pandas→Arrow→py4j conversion was ~0.1 s of driver
    time per build (guide §1.2 step 2). Bounded: distinct literal tables
    per process are a handful; keys use ``repr`` so list-valued cells
    hash fine.
    """
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    try:
        app_id = spark.sparkContext.applicationId
    except Exception:
        app_id = None
    key = (app_id, schema, repr(rows)) if app_id else None
    if key is not None and key in _LOCAL_DF_CACHE:
        return _LOCAL_DF_CACHE[key]
    st = _parse_datatype_string(schema)
    names = [f.name for f in st.fields]
    pdf = pd.DataFrame.from_records(list(rows), columns=names)
    out = spark.createDataFrame(pdf, schema=st)
    if key is not None:
        if len(_LOCAL_DF_CACHE) > 256:
            _LOCAL_DF_CACHE.clear()
        _LOCAL_DF_CACHE[key] = out
    return out
