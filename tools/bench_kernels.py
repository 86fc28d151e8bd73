"""Micro-bench: per-token-Python hash kernels (round-1 implementations,
reproduced inline from winnowing_py / simhash64_py) vs the round-2 pure
Catalyst operators, on a synthetic 60k-doc corpus.

Run:  taskset -c 0-7 python tools/bench_kernels.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F


def old_winnowing(df):
    from dp_search_data_importer_spark.operators.textstats import winnowing_py

    def gen(batches):
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                mins = winnowing_py(text, 5, 4)
                ids.extend([doc_id] * len(mins))
                fps.extend(mins)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "fp": pd.Series(fps, dtype="int64")})

    return df.select("doc_id", "text").mapInPandas(gen, schema="doc_id long, fp long")


def old_simhash(df):
    from dp_search_data_importer_spark.operators.simhash import simhash64_py

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "simhash": pd.Series(
                    [simhash64_py(t) for t in pdf["text"]], dtype="int64"),
            })

    return df.select("doc_id", "text").mapInPandas(
        gen, schema="doc_id long, simhash long")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 80

    from dp_search_data_importer_spark.operators.simhash import simhash_fingerprints
    from dp_search_data_importer_spark.operators.textstats import (
        winnowing_fingerprints,
    )
    from dp_search_data_importer_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")
    words = ["alpha", "beta", "gamma", "delta", "import", "def", "merge",
             "hash", "join", "scan", "sort", "window", "agg", "stream"]
    docs = spark.range(0, n, 1, cpus * 4).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array(*[
            F.element_at(F.array(*[F.lit(w) for w in words]),
                         (F.pmod(F.xxhash64("id", F.lit(i)), F.lit(len(words)))
                          + 1).cast("int"))
            for i in range(n_tokens)
        ])).alias("text"),
    )
    docs.write.mode("overwrite").parquet("/tmp/bench_kernels_docs")
    docs = spark.read.parquet("/tmp/bench_kernels_docs")
    # pre-warm the python worker pool so the old path isn't charged boot time
    docs.limit(64).mapInPandas(lambda it: it, schema=docs.schema.simpleString()
                               .replace("struct<", "").rstrip(">")).count()

    results = {}
    for name, fn in [("winnowing_old_arrow", old_winnowing),
                     ("winnowing_new_catalyst", winnowing_fingerprints),
                     ("simhash_old_arrow", old_simhash),
                     ("simhash_new_catalyst", simhash_fingerprints)]:
        best = None
        rows = None
        for _ in range(2):
            t0 = time.time()
            rows = fn(docs).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        results[name] = (round(best, 2), rows)
        print(f"{name:26s} {best:7.2f}s  rows={rows}", flush=True)

    wo, wn = results["winnowing_old_arrow"][0], results["winnowing_new_catalyst"][0]
    so, sn = results["simhash_old_arrow"][0], results["simhash_new_catalyst"][0]
    print(f"winnowing speedup: {wo / wn:.1f}x   simhash speedup: {so / sn:.1f}x")
    assert results["winnowing_old_arrow"][1] == results["winnowing_new_catalyst"][1]
    assert results["simhash_old_arrow"][1] == results["simhash_new_catalyst"][1]


if __name__ == "__main__":
    main()
