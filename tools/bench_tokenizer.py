"""Tokenizer head-to-head: Arrow/Python code-aware tf extraction
(functions.tokenize.code_term_freqs, the round-1 build default) vs the pure
Catalyst twin (operators.postings.term_freqs_sql(code_aware=True)).

The tokenizer is ~60% of index-build time, so this decides the build
default. Both paths are timed on the SAME materialized synthetic corpus
with a full count() of the (doc_id, term, tf, dl) output (forces the agg
but no write). Equality of the two outputs is asserted once.

Run:  taskset -c 0-(N-1) python tools/bench_tokenizer.py <n_docs> <cpus> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 120000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from dp_search_data_importer_spark.functions.tokenize import code_term_freqs
    from dp_search_data_importer_spark.operators.postings import term_freqs_sql
    from dp_search_data_importer_spark.session import get_spark
    from dp_search_data_importer_spark.sources.repo_files import (
        synthetic_repo_files,
    )

    spark = get_spark(master=f"local[{cpus}]")
    src = os.path.join(tempfile.gettempdir(), f"tok_corpus_{n_docs}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        synthetic_repo_files(spark, n_docs=n_docs, seed=42,
                             num_partitions=128).write.mode("overwrite").parquet(src)
    from dp_search_data_importer_spark.operators.ingest import (
        normalize_repo_files,
    )

    docs = normalize_repo_files(spark.read.parquet(src)).select(
        "doc_id", "content")

    # pre-warm python workers so the Arrow path isn't charged boot time
    docs.limit(64).mapInPandas(
        lambda it: it, schema=docs.schema).count()

    arrow = lambda: code_term_freqs(docs, id_col="doc_id", text_col="content")
    cat = lambda: term_freqs_sql(docs, id_col="doc_id", text_col="content",
                                 code_aware=True)

    # one-time equality proof on a 5k-doc slice (not timed; the full-corpus
    # equality is also property-tested in tests/test_tokenizer.py)
    sub = docs.filter(F.pmod(F.col("doc_id"), F.lit(64)) == 0)
    a = code_term_freqs(sub, id_col="doc_id", text_col="content")
    c = term_freqs_sql(sub, id_col="doc_id", text_col="content",
                       code_aware=True)
    diff = a.exceptAll(c).union(c.exceptAll(a)).count()
    assert diff == 0, f"Arrow vs Catalyst tokenizer outputs differ: {diff} rows"

    out = {"n_docs": n_docs, "cpus": cpus, "equal": True}
    for name, fn in [("arrow_python", arrow), ("catalyst_sql", cat)]:
        best = None
        for _ in range(reps):
            t0 = time.time()
            rows = fn().count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = {"sec": round(best, 2), "rows": rows,
                     "docs_per_sec": round(n_docs / best, 1)}
        print(f"{name:14s} {best:7.2f}s  ({n_docs / best:,.0f} docs/s)",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
