"""Two-parallelism scaling bench (north_rule: throughput scaling efficiency
≥ 0.8 from N to 4N executors; sandbox proxies below).

Two proxies for N→4N executors, both runnable in this sandbox:

- **local mode** (default): local[8] vs local[32], taskset-pinned fresh
  JVMs — one JVM heap serves all task slots, which rounds 2-3 identified
  as the dominant contention source at 32 threads.
- **standalone mode** (``--standalone``): a real multi-JVM Spark
  standalone cluster on this host — 1 master + 1 worker×8 cores vs
  4 workers×8 cores, each worker taskset-pinned to its own 8-core slice
  with its OWN executor JVM heap and Python worker pool. This is a
  materially better N→4N executor proxy: heap, GC, and Python pools are
  isolated per executor exactly as on a real cluster; only disk and
  memory bandwidth stay shared (which a real 4-node cluster would NOT
  share — measured residual documented in BENCH/BASELINE.md).

Runs the identical deterministic index build (same corpus, same code, same
conf except master/topology) in fresh JVMs and reports docs/sec at each
level plus efficiency = (throughput@4N / throughput@N) / 4.
Writes/updates BENCH/BASELINE.md. Usage:

    python tools/bench_scaling.py [n_docs] [repeats]
    python tools/bench_scaling.py --standalone [n_docs] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, shutil, time
sys.path.insert(0, {repo!r})
from dp_search_data_importer_spark.session import get_spark
from dp_search_data_importer_spark.sources.repo_files import synthetic_repo_files
from dp_search_data_importer_spark.plans.build_index import build_index
from dp_search_data_importer_spark.plans import query as qp
from dp_search_data_importer_spark.config import EngineConfig

master = sys.argv[1]
cores = int(sys.argv[2]); n_docs = int(sys.argv[3])
src_dir = sys.argv[4]
dataflow = sys.argv[5] if len(sys.argv) > 5 else "spill"
extra = {{"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)}}
extra.update(json.loads(os.environ.get("SCALE_CONF_JSON", "{{}}")))
spark = get_spark(master=master, app_name=f"scale{{cores}}",
                  shuffle_partitions=cores, extra_conf=extra)
# shards scale with the cluster (exactly as a real N->4N deployment would
# configure them); same input, same code, rank-identical query results
cfg = EngineConfig(n_shards=2 * cores)
# The corpus parquet is materialized once by the parent (the engine's real
# source is an Iceberg/parquet scan, JVM-side; generating via a chained
# Python stage would double per-task workers and pollute the measurement).
corpus = spark.read.parquet(src_dir)

# Pre-warm the Python worker pool to full concurrency (cluster executors are
# long-lived; worker fork+import costs are a one-time cluster warm-up, not
# per-job throughput).
import pandas as _pd
def _noop(it):
    for pdf in it:
        yield pdf
spark.range(0, cores * 4, 1, cores * 4).mapInPandas(_noop, "id long").count()

out = tempfile.mkdtemp(prefix=f"scale_{{cores}}_")
try:
    t0 = time.time()
    stats = build_index(spark, corpus, out, cfg, resume=False, verbose=True,
                        waves=1, dataflow=dataflow)
    build_sec = time.time() - t0
    from dp_search_data_importer_spark.session import local_df
    queries = local_df(spark,
        [(1, "import def"), (2, "getUserName parse"), (3, "shard merge scan"),
         (4, "tokenScore batch"), (5, "hash_map util")],
        "query_id long, query_text string")
    t0 = time.time()
    qp.wand_topk(spark, out, queries, cfg, 10).count()
    q_sec = time.time() - t0
    lat = []
    for i in range(5):
        t0 = time.time()
        qp.wand_topk(spark, out, queries, cfg, 10).count()
        lat.append(time.time() - t0)
    lat.sort()
    print("RESULT " + json.dumps({{
        "cores": cores, "master": master, "dataflow": dataflow,
        "n_docs": n_docs, "build_sec": round(build_sec, 2),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "wand_cold_sec": round(q_sec, 3),
        "wand_p95_sec": round(lat[int(len(lat) * 0.95) - 1], 3),
        "n_postings": int(stats.get("n_docs", 0)),
    }}))
finally:
    shutil.rmtree(out, ignore_errors=True)
"""


# --shm mode: every byte of I/O (corpus scan, shuffle spill, worker dirs,
# index output) goes to tmpfs, removing the shared virtio DISK from the
# measurement entirely. What remains shared across executors is only the
# memory bus — the one resource this single-host sandbox cannot split. The
# delta between --shm and disk-backed runs is therefore a direct measurement
# of the disk's share of the 2→4-executor efficiency decay (BENCH/ANALYSIS
# round-4 hypothesis).
SCALE_TMP = os.environ.get("SCALE_TMP", "")


def _tmpbase() -> str:
    if SCALE_TMP:
        os.makedirs(SCALE_TMP, exist_ok=True)
        return SCALE_TMP
    return tempfile.gettempdir()


def make_corpus(n_docs: int) -> str:
    """Materialize the shared corpus parquet once (full host, unpinned)."""
    import tempfile

    src = os.path.join(_tmpbase(), f"scale_corpus_{n_docs}")
    if os.path.exists(os.path.join(src, "_SUCCESS")):
        return src
    gen = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "from dp_search_data_importer_spark.session import get_spark\n"
        "from dp_search_data_importer_spark.sources.repo_files import synthetic_repo_files\n"
        "spark = get_spark(master='local[*]')\n"
        f"synthetic_repo_files(spark, n_docs={n_docs}, seed=42, num_partitions=128)"
        f".write.mode('overwrite').parquet({src!r})\n"
    ).format(repo=REPO)
    subprocess.run([sys.executable, "-c", gen], check=True, timeout=1800,
                   capture_output=True)
    return src


def run_once(cores: int, n_docs: int, src_dir: str) -> dict:
    """One fresh-JVM run, CPU-affinity-pinned to ``cores`` cores.

    The taskset pin is what makes local[N] an honest proxy for an N-core
    cluster: pyspark's Python UDF workers are separate OS processes that do
    NOT count against Spark's task slots — unpinned, a local[8] run with
    chained mapInPandas stages happily burns 20+ host cores.
    """
    code = WORKER.format(repo=REPO)
    t0 = time.time()
    p = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
         f"local[{cores}]", str(cores), str(n_docs), src_dir],
        capture_output=True, text=True, timeout=1800,
    )
    return _parse_result(p, t0, f"local[{cores}]")


def _parse_result(p, t0: float, label: str) -> dict:
    phases = {}
    for line in p.stdout.splitlines():
        if line.startswith("[build_index] "):
            name, _, val = line[len("[build_index] "):].partition(": ")
            phases[name] = float(val.rstrip("s"))
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["wall_sec"] = round(time.time() - t0, 1)
            r["phases"] = phases
            return r
    sys.stderr.write(p.stdout[-2000:] + "\n" + p.stderr[-4000:])
    raise RuntimeError(f"no RESULT from {label} run")


# ---------------------------------------------------------------------------
# standalone-cluster mode: real multi-JVM executors on this host


def _spark_class() -> tuple[str, dict]:
    import pyspark

    sh = os.path.dirname(pyspark.__file__)
    env = dict(os.environ)
    env["SPARK_HOME"] = sh
    env["PYSPARK_PYTHON"] = sys.executable
    return os.path.join(sh, "bin", "spark-class"), env


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _master_state(webui_port: int) -> dict:
    with urllib.request.urlopen(f"http://127.0.0.1:{webui_port}/json/",
                                timeout=2) as r:
        return json.load(r)


class Standalone:
    """1 master + N workers, each worker taskset-pinned to its own 8-core
    slice with its own JVM heap — fresh per measurement run."""

    def __init__(self, cpusets: list[str], cores_per_worker: int = 8,
                 worker_mem: str = "20g"):
        self.cpusets = cpusets
        self.cores_per_worker = cores_per_worker
        self.worker_mem = worker_mem
        # ports are env-overridable and default to FREE ports so a
        # concurrent bench (or any Spark master already on this host)
        # can't collide or get its cluster measured by mistake (ADVICE r4)
        self.master_port = int(os.environ.get("SPARK_GRAFT_MASTER_PORT",
                                              0)) or _free_port()
        self.webui_port = int(os.environ.get("SPARK_GRAFT_WEBUI_PORT",
                                             0)) or _free_port()
        self.procs: list[subprocess.Popen] = []
        self.log = open(os.path.join(tempfile.gettempdir(),
                                     "scale_standalone.log"), "a")

    def __enter__(self) -> str:
        sc, env = _spark_class()
        self.procs.append(subprocess.Popen(
            [sc, "org.apache.spark.deploy.master.Master",
             "-h", "127.0.0.1", "-p", str(self.master_port),
             "--webui-port", str(self.webui_port)],
            env=env, stdout=self.log, stderr=self.log))
        for _ in range(60):
            try:
                if _master_state(self.webui_port)["status"] == "ALIVE":
                    break
            except Exception:
                time.sleep(1)
        else:
            raise RuntimeError("standalone master did not come up")
        for i, cpus in enumerate(self.cpusets):
            wenv = dict(env)
            wenv["SPARK_WORKER_DIR"] = tempfile.mkdtemp(
                prefix=f"sw{i}_", dir=SCALE_TMP or None)
            if SCALE_TMP:
                # executors inherit SPARK_LOCAL_DIRS from their worker —
                # this is what moves shuffle/spill I/O onto tmpfs
                wenv["SPARK_LOCAL_DIRS"] = tempfile.mkdtemp(
                    prefix=f"sl{i}_", dir=SCALE_TMP)
            self.procs.append(subprocess.Popen(
                ["taskset", "-c", cpus, sc,
                 "org.apache.spark.deploy.worker.Worker",
                 f"spark://127.0.0.1:{self.master_port}",
                 "-c", str(self.cores_per_worker), "-m", self.worker_mem,
                 "--webui-port", str(_free_port())],
                env=wenv, stdout=self.log, stderr=self.log))
        want = len(self.cpusets)
        for _ in range(60):
            try:
                alive = [w for w in
                         _master_state(self.webui_port).get("workers", [])
                         if w["state"] == "ALIVE"]
                if len(alive) >= want:
                    break
            except Exception:
                pass
            time.sleep(1)
        else:
            raise RuntimeError(f"only registered {want} standalone workers")
        return f"spark://127.0.0.1:{self.master_port}"

    def __exit__(self, *exc) -> None:
        for p in reversed(self.procs):
            p.terminate()
        for p in self.procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()


def run_standalone_once(n_workers: int, n_docs: int, src_dir: str,
                        dataflow: str) -> dict:
    """One fresh cluster + fresh driver JVM. Workers pin to disjoint 8-core
    slices; the driver stays unpinned (on a real cluster it is a separate
    node doing plan-only work)."""
    cpusets = [f"{8 * i}-{8 * i + 7}" for i in range(n_workers)]
    total = 8 * n_workers
    conf = {
        "spark.executor.cores": "8",        # exactly one executor per worker
        "spark.executor.memory": "16g",
        "spark.cores.max": str(total),
        "spark.executorEnv.PYTHONPATH": REPO,
        "spark.executorEnv.PYSPARK_PYTHON": sys.executable,
    }
    code = WORKER.format(repo=REPO)
    if SCALE_TMP:
        conf["spark.local.dir"] = os.path.join(SCALE_TMP, "driver_local")
    with Standalone(cpusets) as master_url:
        env = dict(os.environ)
        env["SCALE_CONF_JSON"] = json.dumps(conf)
        if SCALE_TMP:
            # the worker script's tempfile.mkdtemp (index out dir) follows
            # TMPDIR — index shards get written to tmpfs too
            env["TMPDIR"] = SCALE_TMP
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", code, master_url, str(total),
             str(n_docs), src_dir, dataflow],
            capture_output=True, text=True, timeout=1800, env=env,
        )
        r = _parse_result(p, t0, f"standalone x{n_workers}")
        r["n_workers"] = n_workers
        return r


def run_standalone(n_workers: int, n_docs: int, src_dir: str, dataflow: str,
                   repeats: int = 2) -> dict:
    results = [run_standalone_once(n_workers, n_docs, src_dir, dataflow)
               for _ in range(repeats)]
    best = min(results, key=lambda r: r["build_sec"])
    best["runs_build_sec"] = [r["build_sec"] for r in results]
    return best


def main_standalone() -> None:
    args = [a for a in sys.argv[2:]]
    n_docs = int(args[0]) if args else 60000
    repeats = int(args[1]) if len(args) > 1 else 2
    # worker counts: 1,2,4 by default (the 2-worker midpoint localizes the
    # decay — round 4 showed 1→2 at 0.78-0.82 with all loss in 2→4).
    workers = ([int(w) for w in args[2].split(",")] if len(args) > 2
               else [1, 2, 4])
    src_dir = make_corpus(n_docs)
    out: dict = {"n_docs": n_docs, "mode": "standalone",
                 "tmpfs": bool(SCALE_TMP), "workers": workers}
    for dataflow in ("spill", "fused"):
        runs = {w: run_standalone(w, n_docs, src_dir, dataflow, repeats)
                for w in workers}
        base = runs[workers[0]]["docs_per_sec"]
        sect: dict = {}
        for w in workers:
            sect[f"workers_{w}x8"] = runs[w]
            sect[f"eff_1_to_{w}"] = round(
                (runs[w]["docs_per_sec"] / base) / (w / workers[0]), 3)
        out[dataflow] = sect
        print(json.dumps({dataflow: sect}, indent=2))
    name = "standalone_shm.json" if SCALE_TMP else "standalone.json"
    path = os.path.join(REPO, "BENCH", name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


def run(cores: int, n_docs: int, src_dir: str, repeats: int = 2) -> dict:
    """Best-of-N (min build time): the sandbox host has noisy neighbors;
    min is the standard contention-resistant estimator."""
    results = [run_once(cores, n_docs, src_dir) for _ in range(repeats)]
    best = min(results, key=lambda r: r["build_sec"])
    best["runs_build_sec"] = [r["build_sec"] for r in results]
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo, hi = 8, 32
    src_dir = make_corpus(n_docs)
    r_lo = run(lo, n_docs, src_dir, repeats)
    r_hi = run(hi, n_docs, src_dir, repeats)
    eff = (r_hi["docs_per_sec"] / r_lo["docs_per_sec"]) / (hi / lo)
    out = {
        "n_docs": n_docs,
        f"local[{lo}]": r_lo,
        f"local[{hi}]": r_hi,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(out, indent=2))

    # BENCH/BASELINE.md is a CURATED document (multi-round history,
    # standalone-cluster sections); overwriting it from here once cost a
    # round of context — write the raw JSON sidecar instead and update
    # the markdown by hand.
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    js = os.path.join(REPO, "BENCH", "scaling_local.json")
    with open(js, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {js}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--standalone":
        main_standalone()
    else:
        main()
