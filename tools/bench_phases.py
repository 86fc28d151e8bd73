"""Phase decomposition for index_build (guide §1: measure first).

Not part of the frozen bench contract — cites numbers for OPTIMIZATION_r06.md.
Usage: python tools/bench_phases.py [n_docs] [dataflow] [waves]
"""
import os
import sys
import tempfile
import time
import shutil

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.plans.build_index import build_index
from dp_search_data_importer_spark.session import get_spark
from dp_search_data_importer_spark.sources.repo_files import synthetic_repo_files


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    dataflow = sys.argv[2] if len(sys.argv) > 2 else "spill"
    waves = int(sys.argv[3]) if len(sys.argv) > 3 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="bench_phases",
                      shuffle_partitions=cpus)
    spark.range(0, cpus * 4, 1, cpus * 4).mapInPandas(
        lambda it: it, "id long").count()
    cfg = EngineConfig(n_shards=max(8, cpus // 2))
    corpus = synthetic_repo_files(spark, n_docs=n_docs, seed=42)
    for i in range(2):
        out = tempfile.mkdtemp(prefix="bench_phase_idx_")
        try:
            t0 = time.time()
            build_index(spark, corpus, out, cfg, resume=False,
                        dataflow=dataflow, waves=waves, verbose=True)
            print(f"RUN {i}: total={time.time()-t0:.2f}s "
                  f"(n_docs={n_docs}, dataflow={dataflow}, waves={waves})",
                  flush=True)
        finally:
            shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
