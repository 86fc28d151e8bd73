"""End-to-end index build (SURVEY.md §3.1 Spark mapping, §7 steps 2-4, 6).

Replaces the reference's entire data path — Kafka batch → Avro decode →
filter → transform → ES bulk upsert (``/root/reference/handler/handler.go:36-129``)
— with a Spark-native build whose *output* is the inverted index ES would have
built internally:

  repo_files ──normalize (A3-A6: key filter, doc_id, sha256)──▶ docs
    docs ──code tokenizer, map-side (term, tf, dl) [Arrow]──▶ tf pairs
      tf ──salted agg──▶ term_df dictionary;  docs ──agg──▶ N, avgdl
      tf ──repartition(shard) + sortWithinPartitions(shard, term, doc_id)──▶
         sorted runs ──mapInPandas block compressor (delta+varint, impacts,
         optional positions)──▶ postings blocks, parquet dir-partitioned
         by shard + per-shard manifest (lineage/metrics, resume)

Two dataflows, selected by ``build_index(dataflow=)`` and measured
head-to-head in BENCH/ANALYSIS.md (round 3):

- ``"spill"`` (default): tf pairs are materialized once to a compact
  parquet intermediate consumed by stats/term_df/waves. On the bench host
  the spill is page-cache-buffered (it is NOT an extra disk round-trip in
  practice) and keeps every stage homogeneous — best measured local[32]
  throughput and 8→32 scaling.
- ``"fused"``: each wave tokenizes its own disjoint doc slice straight
  into the shuffle (no spill; term_df/Σdl derived from block metadata).
  Strictly less I/O — wins at fixed 8-core budgets, the realistic
  per-executor shape — but loses inside one big local JVM where 32 tasks
  + as many Python workers contend for a single heap.

Scale design (the part that must survive 10^12 files / 1000 executors):

- the ONLY wide shuffle over postings-sized data is the single shard
  repartition — tf pairs are already pre-aggregated map-side, so shuffle
  volume is O(distinct (doc,term)) not O(tokens);
- sharding on hash(doc_id) is the structural skew answer for block building:
  tasks are whole shards and shard sizes are uniform by construction, so a
  hot term ('import' ≈ every doc) cannot skew any task — its postings are
  striped evenly across all shards, emitted as independent bounded blocks
  (no collect_list anywhere; within-shard volume is bounded by corpus/n_shards
  and n_shards scales with the cluster);
- the salted two-phase df aggregation bounds the dictionary reducers;
- shards (doc-space hash partitions, Elasticsearch-style) give query-time
  fan-out/merge parallelism and are the unit of checkpoint/resume;
- doc lengths are embedded in the blocks, so query-time scoring never joins
  the docs table.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.checkpoint import (
    append_manifest,
    completed_shards,
    read_stats_json,
    shard_metrics,
    write_stats_json,
)
from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.functions.tokenize import (
    code_term_freqs,
    simple_term_freqs,
)
from dp_search_data_importer_spark.operators.codec import (
    encode_blocks_batch,
)
from dp_search_data_importer_spark.operators.ingest import normalize_repo_files
from dp_search_data_importer_spark.operators.postings import doc_freqs, hot_terms

BLOCKS_SCHEMA = (
    "shard int, term string, block_id long, first_doc_id long, n_docs long, "
    "doc_gaps binary, tfs binary, dls binary, "
    "imp_tfs array<bigint>, imp_dls array<bigint>, poss binary, sum_tf long"
)


def block_impacts(tfs: np.ndarray, dls: np.ndarray) -> tuple[list[int], list[int]]:
    """Per-block IMPACTS (Lucene-style): the Pareto frontier of (tf, dl)
    pairs — tf↑ is better, dl↓ is better, so keep, scanning dl ascending,
    only pairs whose tf strictly exceeds every smaller-dl pair's tf. The
    query-time upper bound is max over pairs of tf·(k1+1)/(tf+k1·(1−b+
    b·dl/avgdl)) with the CURRENT avgdl — blocks carry no corpus statistic,
    so incremental upserts never invalidate other shards' bounds (the
    round-1 ``max_tf_norm`` baked the build-time avgdl into every block)."""
    order = np.lexsort((-tfs, dls))  # dl asc, tf desc within equal dl
    out_tf: list[int] = []
    out_dl: list[int] = []
    best = -1
    for i in order:
        t = int(tfs[i])
        if t > best:
            out_tf.append(t)
            out_dl.append(int(dls[i]))
            best = t
    return out_tf, out_dl


def _compress_runs(
    batches: Iterator[pd.DataFrame], block_size: int,
    with_positions: bool = False,
) -> Iterator[pd.DataFrame]:
    """Consume doc_id-sorted (shard, term, doc_id, tf, dl[, positions]) runs;
    emit compressed blocks. Runs may span Arrow batches within a partition,
    so a partial tail is carried over until the (shard, term) key changes.

    Each block carries its impact pairs (see :func:`block_impacts`); the
    build needs NO corpus statistics and no join against the term
    dictionary — WAND bounds assemble at query time from (impacts, idf,
    avgdl). With ``with_positions`` each block additionally carries a
    ``poss`` varint stream (per-posting delta-encoded token positions,
    lengths given by the decoded tfs — Lucene .prx-style); without it,
    ``poss`` is null.
    """
    from dp_search_data_importer_spark.operators.codec import encode_positions

    # carry = column arrays of a run's (< block_size) tail awaiting the
    # next batch: (shard, term, doc_ids, tfs, dls, plists)
    carry: tuple | None = None
    out_cols = ("shard", "term", "block_id", "first_doc_id", "n_docs",
                "doc_gaps", "tfs", "dls", "imp_tfs", "imp_dls", "poss",
                "sum_tf")

    def flush(shard: int, term, doc_ids, tfs, dls, plists, rows: list, *,
              final: bool) -> int:
        """Emit full blocks from the array slices; return the number of
        rows consumed (a multiple of block_size unless final). All of a
        run's blocks varint-encode in ONE vectorized pass
        (``encode_blocks_batch``, byte-identical to per-block
        ``encode_block`` by the codec equivalence test) — the per-block
        numpy dispatch was ~60% of this kernel's time (guide §1.2 step 2)."""
        n = len(doc_ids)
        n_full_end = n if final else (n // block_size) * block_size
        if n_full_end == 0:
            return 0
        starts = np.arange(0, n_full_end, block_size)
        g_all, t_all, d_all = encode_blocks_batch(
            doc_ids, tfs, dls, starts, n_full_end)
        sum_tfs = np.add.reduceat(tfs[:n_full_end], starts)
        for bi, start in enumerate(starts.tolist()):
            end = min(start + block_size, n_full_end)
            tfs_b, dls_b = tfs[start:end], dls[start:end]
            imp_tf, imp_dl = block_impacts(tfs_b, dls_b)
            if with_positions:
                flat = (
                    np.concatenate(
                        [np.asarray(x, dtype=np.int64)
                         for x in plists[start:end]])
                    if end > start else np.empty(0, dtype=np.int64)
                )
                p = encode_positions(flat, tfs_b)
            else:
                p = None
            rows.append(
                (shard, term, bi, int(doc_ids[start]), end - start,
                 g_all[bi], t_all[bi], d_all[bi], imp_tf, imp_dl, p,
                 int(sum_tfs[bi]))
            )
        return n_full_end

    def to_pdf(rows: list) -> pd.DataFrame:
        return pd.DataFrame(rows, columns=out_cols)

    for pdf in batches:
        if pdf.empty and carry is None:
            continue
        # column arrays once per batch — the earlier per-run DataFrame
        # slicing and a string-concat run key cost seconds per task at
        # millions of tf rows (guide §1.2 step 2: per-task work)
        sh = pdf["shard"].to_numpy()
        tm = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        plists = pdf["positions"].to_numpy() if with_positions else None
        if carry is not None:
            c_sh, c_tm, c_ids, c_tfs, c_dls, c_pl = carry
            sh = np.concatenate((np.full(len(c_ids), c_sh), sh))
            tm = np.concatenate((np.full(len(c_ids), c_tm, dtype=object), tm))
            doc_ids = np.concatenate((c_ids, doc_ids))
            tfs = np.concatenate((c_tfs, tfs))
            dls = np.concatenate((c_dls, dls))
            if with_positions:
                plists = np.concatenate((c_pl, plists))
            carry = None
        n = len(doc_ids)
        if n == 0:
            continue
        # contiguous (shard, term) runs within the batch
        change = np.flatnonzero(
            (sh[1:] != sh[:-1]) | (tm[1:] != tm[:-1])) + 1
        bounds = np.concatenate(([0], change, [n]))
        rows: list = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            is_last_run = i == len(bounds) - 2
            used = flush(int(sh[lo]), tm[lo], doc_ids[lo:hi], tfs[lo:hi],
                         dls[lo:hi], None if plists is None
                         else plists[lo:hi], rows, final=not is_last_run)
            if is_last_run and lo + used < hi:
                s = lo + used
                carry = (int(sh[lo]), tm[lo], doc_ids[s:hi], tfs[s:hi],
                         dls[s:hi],
                         None if plists is None else plists[s:hi])
        if rows:
            yield to_pdf(rows)
    if carry is not None:
        c_sh, c_tm, c_ids, c_tfs, c_dls, c_pl = carry
        rows = []
        flush(c_sh, c_tm, c_ids, c_tfs, c_dls, c_pl, rows, final=True)
        yield to_pdf(rows)


def _sorted_runs_frame(subset: DataFrame, wave_shards: list[int],
                       par: int) -> tuple[DataFrame, bool]:
    """Shuffle tf rows into doc_id-sorted (shard, term) runs for the block
    compressor, using ALL available task slots (guide §2.5): with fewer
    shards than cores, one-task-per-shard leaves (par − n_shards) cores
    idle through the sort+compress+write stage. Sub-bucket each shard by a
    deterministic term hash — every (shard, term) run stays whole inside
    one task (bucket is a function of term), so block numbering and
    compression are byte-identical. Bucket count is ~4× the task count so
    the hash spreads evenly (guide §2.5: use many more distinct key
    values than partitions).

    Returns (frame, bucketed). When ``bucketed``, the caller must gather
    the compressed blocks back to one task per shard before the
    partitioned write: leaving sub² files per shard dir measured 2.3×
    slower exact-query reads (115 vs 16 files at the bench index). The
    gather shuffles BLOCK rows (compressed bytes, far smaller than tf)
    and only exists in the shards<cores regime — at scale shards ≥
    parallelism, sub=1, and neither extra shuffle happens."""
    n_sh = len(wave_shards)
    sub = max(1, min(8, (4 * par) // max(1, n_sh)))
    if sub > 1:
        ntasks = min(par, n_sh * sub)
        return (
            subset.withColumn(
                "_tb", F.pmod(F.xxhash64("term"), F.lit(sub)).cast("int"))
            .repartition(ntasks, "shard", "_tb")
            .sortWithinPartitions("shard", "term", "doc_id")
            .drop("_tb")
        ), True
    return subset.repartition(n_sh, "shard").sortWithinPartitions(
        "shard", "term", "doc_id"), False


def tokenize_docs(docs: DataFrame, *, code_aware: bool = True,
                  text_col: str = "content",
                  tokenizer: str = "arrow",
                  positions: bool = False) -> DataFrame:
    """Map-side (doc_id, term, tf, dl[, positions]) extraction.
    ``tokenizer="arrow"`` (default) is the Python/Arrow Counter path;
    ``"sql"`` is the pure Catalyst twin — row-identical (property-tested),
    preferable on JVM-only executors. Measured trade-off in
    BENCH/ANALYSIS.md (round 2). ``positions=True`` adds each row's
    ascending token positions (len == tf) for positional index builds."""
    if positions:
        if tokenizer == "sql":
            from dp_search_data_importer_spark.operators.phrase import (
                doc_positions,
            )

            return doc_positions(
                docs, code_aware=code_aware, text_col=text_col,
            ).select("doc_id", "term",
                     F.size("positions").cast("long").alias("tf"),
                     "dl", "positions")
        from dp_search_data_importer_spark.functions.tokenize import (
            term_freqs_with_positions,
        )

        return term_freqs_with_positions(
            docs, code_aware=code_aware, text_col=text_col)
    if tokenizer == "sql":
        from dp_search_data_importer_spark.operators.postings import (
            term_freqs_sql,
        )

        return term_freqs_sql(docs, id_col="doc_id", text_col=text_col,
                              code_aware=code_aware)
    fn = code_term_freqs if code_aware else simple_term_freqs
    return fn(docs, id_col="doc_id", text_col=text_col)


def build_index(
    spark: SparkSession,
    repo_files: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    *,
    code_aware: bool = True,
    text_col: str = "content",
    tokenizer: str = "arrow",
    waves: int | None = None,
    resume: bool = True,
    already_normalized: bool = False,
    check_collisions: bool = False,
    positions: bool = False,
    dataflow: str = "spill",
    verbose: bool = False,
) -> dict:
    """Build (or resume) the sharded compressed index under ``out_dir``.

    ``waves=None`` (default) sizes the wave count adaptively: one wave when
    the cluster has at least one task slot per shard (the common case —
    serial waves would leave slots idle), more only when shards exceed
    parallelism. Pass an explicit ``waves`` to pin the resume granularity.

    ``positions=True`` builds a POSITIONAL index: each block carries a
    varint position stream (``poss``) and phrase queries decode positions
    straight from the postings — no sidecar, no duplicated keys. ~Half the
    positional storage of the round-2 sidecar (measured, BENCH/ANALYSIS.md).

    Layout:
      out_dir/docs/        doc map (doc_id, repo, path, commit, lang,
                           content_sha256, shard) — parquet by shard
      out_dir/term_df/     global term dictionary (term, df)
      out_dir/postings/    block rows (BLOCKS_SCHEMA) — parquet by shard
      out_dir/_manifest/   per-shard lineage + metrics (checkpoint.py)
      out_dir/stats.json   n_docs, avgdl, config echo

    Returns the stats dict.
    """
    import time as _time

    _t0 = _time.time()
    _phases: dict[str, float] = {}

    def _mark(name: str) -> None:
        # phases overlap across driver threads now, so report absolute
        # elapsed-since-build-start (monotone per thread, thread-safe)
        if verbose:
            _phases[name] = round(_time.time() - _t0, 2)
            print(f"[build_index] {name}: +{_phases[name]}s", flush=True)

    import shutil as _shutil

    if dataflow == "fused":
        return _build_index_fused(
            spark, repo_files, out_dir, cfg, code_aware=code_aware,
            text_col=text_col, tokenizer=tokenizer, waves=waves,
            resume=resume, already_normalized=already_normalized,
            check_collisions=check_collisions, positions=positions,
            verbose=verbose)
    cfg = cfg or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    # measured-df feedback: capture the PREVIOUS build's heavy hitters
    # before any cleanup or stats-branch check — they seed this build's
    # salting (SURVEY.md §7 hard part b). Captured here (not inside the
    # stats branch below) so a fresh rebuild (resume=False) and a resumed
    # build both see them.
    prior_hot: list[str] = []
    stats_path = os.path.join(out_dir, "stats.json")
    if os.path.exists(stats_path):
        try:
            prior_hot = read_stats_json(out_dir).get("hot_terms", [])
        except (OSError, ValueError):
            prior_hot = []
    if not resume:
        # a fresh build into an existing out_dir must not inherit stale
        # postings/manifest rows (re-run with resume=False used to APPEND
        # postings on top of committed blocks — duplicated scores). The
        # positions sidecar belongs to the previous corpus too.
        for sub in ("postings", "_manifest", "docs", "term_df", "positions"):
            _shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        for fn in ("stats.json",):
            try:
                os.remove(os.path.join(out_dir, fn))
            except FileNotFoundError:
                pass
    docs = repo_files if already_normalized else normalize_repo_files(repo_files)
    if check_collisions and not already_normalized:
        from dp_search_data_importer_spark.operators.ingest import (
            assert_no_doc_id_collisions,
        )

        assert_no_doc_id_collisions(docs)
    docs = docs.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
    )

    done = completed_shards(spark, out_dir) if (
        resume and os.path.exists(out_dir)
    ) else set()
    if resume and os.path.exists(stats_path) and len(done) == cfg.n_shards:
        return read_stats_json(out_dir)

    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    par = max(1, spark.sparkContext.defaultParallelism)
    if waves is None:
        # adaptive: serial waves only when shards exceed task slots —
        # at 16 shards on 32 slots, two waves of 8 tasks each left half
        # the host idle twice (guide §2.6 / scale-adaptive partitioning)
        waves = max(1, -(-cfg.n_shards // par))

    # Independent jobs overlap via a small driver thread pool (guide §2.6):
    # the docs write (a second pass over the source) runs concurrently with
    # the tokenize spill; the term_df aggregation and the stats assembly run
    # concurrently with the postings waves. Spark's scheduler back-fills
    # idle slots from the concurrent job; commit ORDER is unchanged — the
    # manifest still lands only after its wave's postings are on disk, and
    # stats.json still requires docs/ + term_df/ to be committed first.
    do_stats = not (resume and os.path.exists(stats_path))
    pool = ThreadPoolExecutor(max_workers=2)

    def _docs_job() -> dict[int, int]:
        # ---- docs write (one pass over the source). N and per-shard doc
        # counts come from the WRITTEN docs table, not from tf: a doc whose
        # content tokenizes to zero terms is still a document — Lucene's
        # BM25 docCount includes it, so idf/avgdl must divide by it too,
        # and the manifest must agree with docs/.
        # repartition to one task per shard before the partitioned write:
        # writing K shard dirs from T unrelated tasks creates T×K file
        # fragments and a per-task partition sort (measured 25× slower at
        # local[32]); post-shuffle each task owns exactly one shard dir.
        # per-shard doc counts piggyback on the docs write via observe
        # (observe supports only global aggs, so the per-shard breakdown
        # is a when-sum per shard — fine for shard counts in the
        # hundreds; beyond that, fall back to counting the written dirs)
        docs_obs = Observation() if cfg.n_shards <= 256 else None
        to_write = docs.drop(text_col, "content", "dl")
        if docs_obs is not None:
            to_write = to_write.observe(docs_obs, *[
                F.sum((F.col("shard") == s).cast("long")).alias(f"s{s}")
                for s in range(cfg.n_shards)
            ])
        (to_write.repartition(cfg.n_shards, "shard")
         .write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(out_dir, "docs")))
        _mark("docs_write")
        if docs_obs is not None:
            got = docs_obs.get
            return {s: int(got[f"s{s}"] or 0) for s in range(cfg.n_shards)}
        return {
            int(r["shard"]): int(r["n"])
            for r in spark.read.parquet(os.path.join(out_dir, "docs"))
            .groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    docs_fut = pool.submit(_docs_job) if do_stats else None

    # Materialize the tf pairs ONCE as a compact parquet intermediate (the
    # tokenizer is the expensive pass; three consumers read the result).
    # A .persist() memory cache here anti-scales: materializing tens of
    # millions of cached rows while every core also runs a Python tokenizer
    # worker thrashes the JVM memory store (measured: 32-core tokenize+stats
    # 156 s vs 88 s at 8 cores on 120k docs; parquet spill removes it).
    # This is also the 10^12-scale design — the intermediate is a table,
    # not executor memory.
    tf_tmp = os.path.join(out_dir, "_tf_tmp")
    tf_src = tokenize_docs(docs, code_aware=code_aware, text_col=text_col,
                           tokenizer=tokenizer,
                           positions=positions).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
    )
    # Σdl piggybacks on the spill job via df.observe — no extra tf scan
    # (job-count discipline: every extra job is a full pass at 10^12 scale)
    tf_obs: Observation | None = None
    if not (resume and os.path.exists(os.path.join(tf_tmp, "_SUCCESS"))):
        tf_obs = Observation()
        (tf_src.observe(tf_obs, F.sum("tf").alias("sum_dl"))
         .write.mode("overwrite").parquet(tf_tmp))
    tf = spark.read.parquet(tf_tmp)
    _mark("tokenize_spill")
    # set BEFORE concurrent jobs start: session conf, not thread-local
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        shard_docs: dict[int, int] | None = None
        stats_fut = None
        if do_stats:
            def _stats_job() -> dict:
                # measured-df-driven salting (SURVEY.md §7 hard part b):
                # static hot list bootstraps; the previous build's measured
                # heavy hitters (prior_hot, captured before cleanup above)
                # extend it, and this build's measurement is recorded in
                # stats.json below to drive the NEXT build.
                hot = sorted(set(cfg.static_hot_terms) | set(prior_hot))
                doc_freqs(tf, cfg, hot=hot).write.mode("overwrite").parquet(
                    os.path.join(out_dir, "term_df")
                )
                _mark("term_df_write")
                shard_counts = docs_fut.result()
                # Σ_doc dl = Σ_doc Σ_term tf = sum(tf): observed on the
                # spill job above; the agg below runs only on the rare
                # resume-with-tf-but-no-stats path. Zero-term docs
                # contribute 0 to the sum and are counted in N via docs.
                if tf_obs is not None:
                    sum_dl_total = int(tf_obs.get["sum_dl"] or 0)
                else:
                    sum_dl_total = (
                        tf.agg(F.sum("tf").alias("s")).collect()[0]["s"] or 0
                    )
                n_docs_total = sum(shard_counts.values())
                stats = {
                    "n_docs": int(n_docs_total),
                    "sum_dl": int(sum_dl_total),  # exact int: incremental
                    # upserts adjust it by ±deltas instead of reconstructing
                    # from the float avgdl
                    "avgdl": (float(sum_dl_total / n_docs_total)
                              if n_docs_total else 0.0),
                    "k1": cfg.k1, "b": cfg.b,
                    "block_size": cfg.block_size, "n_shards": cfg.n_shards,
                    "code_aware": code_aware,
                    "positions": positions,
                    "shard_docs": {int(s): n
                                   for s, n in shard_counts.items()},
                }
                stats["hot_terms"] = hot_terms(
                    spark.read.parquet(os.path.join(out_dir, "term_df")),
                    n_docs_total, cfg,
                )
                write_stats_json(out_dir, stats)
                return stats

            stats_fut = pool.submit(_stats_job)
        else:
            stats = read_stats_json(out_dir)
            shard_docs = {int(k): v
                          for k, v in stats.get("shard_docs", {}).items()}

        # ---- postings waves (unit of resume)
        shards_per_wave = max(1, -(-cfg.n_shards // waves))
        for w in range(waves):
            wave_shards = [
                s for s in range(w * shards_per_wave,
                                 min((w + 1) * shards_per_wave, cfg.n_shards))
                if s not in done
            ]
            if not wave_shards:
                continue
            subset = (tf if len(wave_shards) == cfg.n_shards
                      else tf.filter(F.col("shard").isin(wave_shards)))
            # shuffle on (shard, term-bucket): doc-hash sharding keeps task
            # sizes uniform (hot TERMS cannot skew a doc-partitioned
            # build); the term sub-bucket spreads the sort+compress stage
            # over every task slot when shards < cores (see
            # _sorted_runs_frame).
            sorted_runs, bucketed = _sorted_runs_frame(subset, wave_shards,
                                                       par)
            blocks = sorted_runs.mapInPandas(
                lambda it: _compress_runs(it, cfg.block_size,
                                          with_positions=positions),
                schema=BLOCKS_SCHEMA,
            )
            if bucketed:
                # gather compressed blocks to one sorted file per shard
                # dir (read-side layout; see _sorted_runs_frame)
                blocks = blocks.repartition(
                    len(wave_shards), "shard"
                ).sortWithinPartitions("shard", "term", "block_id")
            # dynamic partition overwrite, NOT append: a crash in the window
            # between the postings commit and append_manifest leaves the wave
            # un-manifested; the resume rebuilds it, and overwrite replaces
            # the stale shard=s dirs instead of appending duplicate blocks
            # (duplicated postings would double exact scores and inflate WAND).
            (blocks.write.mode("overwrite").partitionBy("shard")
             .parquet(os.path.join(out_dir, "postings")))
            _mark(f"wave{w}_compress_write")
            if shard_docs is None:
                shard_docs = docs_fut.result()
            # manifest from read-back: certifies disk state (checkpoint.py)
            written = spark.read.parquet(
                os.path.join(out_dir, "postings")
            ).filter(F.col("shard").isin(wave_shards))
            ndocs_expr = F.coalesce(
                *[F.when(F.col("shard") == s, F.lit(int(shard_docs.get(s, 0))))
                  for s in wave_shards],
                F.lit(0),
            )
            append_manifest(
                shard_metrics(written).select(
                    "shard",
                    ndocs_expr.cast("long").alias("n_docs"),
                    "n_postings", "n_blocks", "bytes_compressed",
                    "content_fingerprint", "n_terms",
                ),
                out_dir,
            )
            _mark(f"wave{w}_manifest")
        if stats_fut is not None:
            stats = stats_fut.result()
        return stats
    finally:
        pool.shutdown(wait=True)
        _shutil.rmtree(tf_tmp, ignore_errors=True)


def _build_index_fused(
    spark: SparkSession,
    repo_files: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    *,
    code_aware: bool = True,
    text_col: str = "content",
    tokenizer: str = "arrow",
    waves: int | None = None,
    resume: bool = True,
    already_normalized: bool = False,
    check_collisions: bool = False,
    positions: bool = False,
    verbose: bool = False,
) -> dict:
    """Fused single-shuffle dataflow (round 3, ``dataflow="fused"``):
    each wave tokenizes its own disjoint doc slice straight into the one
    wide shuffle — no tf spill, strictly less I/O than the spill dataflow
    (the build's largest intermediate never round-trips storage), and
    term_df/Σdl derive from block METADATA (column-pruned read-back,
    shard-partial agg = structurally skew-free). Measured head-to-head
    (BENCH/ANALYSIS.md round 3): wins at fixed 8-core budgets (the real
    per-executor shape) but loses at local[32], where one JVM heap serving
    32 tasks + as many Python workers contends — hence selectable, not
    default, on this host.

    ``positions=True`` builds a POSITIONAL index: each block carries a
    varint position stream (``poss``) and phrase queries decode positions
    straight from the postings — no sidecar, no duplicated keys. ~Half the
    positional storage of the round-2 sidecar (measured, BENCH/ANALYSIS.md).

    Layout:
      out_dir/docs/        doc map (doc_id, repo, path, commit, lang,
                           content_sha256, shard) — parquet by shard
      out_dir/term_df/     global term dictionary (term, df)
      out_dir/postings/    block rows (BLOCKS_SCHEMA) — parquet by shard
      out_dir/_manifest/   per-shard lineage + metrics (checkpoint.py)
      out_dir/stats.json   n_docs, avgdl, config echo

    Returns the stats dict.
    """
    import time as _time

    _t0 = _time.time()
    _phases: dict[str, float] = {}

    def _mark(name: str) -> None:
        # phases overlap across driver threads, so report absolute
        # elapsed-since-build-start (monotone per thread, thread-safe)
        if verbose:
            _phases[name] = round(_time.time() - _t0, 2)
            print(f"[build_index] {name}: +{_phases[name]}s", flush=True)

    import shutil as _shutil

    cfg = cfg or EngineConfig()
    os.makedirs(out_dir, exist_ok=True)
    stats_path = os.path.join(out_dir, "stats.json")
    if not resume:
        # a fresh build into an existing out_dir must not inherit stale
        # postings/manifest rows (re-run with resume=False used to APPEND
        # postings on top of committed blocks — duplicated scores). The
        # positions sidecar belongs to the previous corpus too.
        for sub in ("postings", "_manifest", "docs", "term_df", "positions"):
            _shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)
        for fn in ("stats.json",):
            try:
                os.remove(os.path.join(out_dir, fn))
            except FileNotFoundError:
                pass
    docs = repo_files if already_normalized else normalize_repo_files(repo_files)
    if check_collisions and not already_normalized:
        from dp_search_data_importer_spark.operators.ingest import (
            assert_no_doc_id_collisions,
        )

        assert_no_doc_id_collisions(docs)
    docs = docs.withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
    )

    done = completed_shards(spark, out_dir) if (
        resume and os.path.exists(out_dir)
    ) else set()
    if resume and os.path.exists(stats_path) and len(done) == cfg.n_shards:
        return read_stats_json(out_dir)

    # ---- docs table FIRST (one pass over the source; N and per-shard doc
    # counts come from the WRITTEN docs table, not from tf: a doc whose
    # content tokenizes to zero terms is still a document — Lucene's BM25
    # docCount includes it, so idf/avgdl must divide by it too, and the
    # manifest must agree with docs/).
    # repartition to one task per shard before the partitioned write:
    # writing K shard dirs from T unrelated tasks creates T×K file
    # fragments and a per-task partition sort (measured 25× slower at
    # local[32]); post-shuffle each task owns exactly one shard dir.
    # per-shard doc counts piggyback on the write via observe (observe
    # supports only global aggs, so the breakdown is a when-sum per shard —
    # fine for shard counts in the hundreds; beyond that, fall back to
    # counting the written dirs).
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import Observation

    docs_done = resume and os.path.exists(
        os.path.join(out_dir, "docs", "_SUCCESS"))

    def _docs_job() -> dict[int, int]:
        shard_counts: dict[int, int] = {}
        if not docs_done:
            docs_obs = Observation() if cfg.n_shards <= 256 else None
            to_write = docs.drop(text_col, "content", "dl")
            if docs_obs is not None:
                to_write = to_write.observe(docs_obs, *[
                    F.sum((F.col("shard") == s).cast("long")).alias(f"s{s}")
                    for s in range(cfg.n_shards)
                ])
            (to_write.repartition(cfg.n_shards, "shard")
             .write.mode("overwrite").partitionBy("shard")
             .parquet(os.path.join(out_dir, "docs")))
            _mark("docs_write")
            if docs_obs is not None:
                got = docs_obs.get
                shard_counts = {s: int(got[f"s{s}"] or 0)
                                for s in range(cfg.n_shards)}
        if not shard_counts:
            shard_counts = {
                int(r["shard"]): int(r["n"])
                for r in spark.read.parquet(os.path.join(out_dir, "docs"))
                .groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            shard_counts = {s: shard_counts.get(s, 0)
                            for s in range(cfg.n_shards)}
        return shard_counts

    # the docs pass is independent of the postings waves — run it
    # concurrently so the wave's tokenize stage back-fills its tail
    # (guide §2.6); its result is first needed at manifest time
    pool = ThreadPoolExecutor(max_workers=2)
    docs_fut = pool.submit(_docs_job)
    shard_counts: dict[int, int] | None = None

    # ---- postings waves (unit of resume). Round-3 dataflow: each wave
    # tokenizes ITS OWN docs straight into the one wide shuffle — the
    # round-2 design spilled the full tf table to parquet first and then
    # re-read + re-shuffled it per wave, sending the build's largest
    # intermediate through the (single, shared) disk twice. Because waves
    # partition DOCS disjointly, per-wave tokenization does zero duplicate
    # work, and the map stage (Python tokenizer) overlaps the reduce
    # stage's sort/compress/write across tasks inside one job. Corpus
    # statistics that round 2 harvested from the tf spill (Σdl, term df)
    # now derive from block METADATA read back from the written index —
    # a column-pruned scan ~128× smaller than the tf rows (see below).
    par = max(1, spark.sparkContext.defaultParallelism)
    if waves is None:
        waves = max(1, -(-cfg.n_shards // par))
    shards_per_wave = max(1, -(-cfg.n_shards // waves))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    wave_lists = [ws for ws in (
        [s for s in range(w * shards_per_wave,
                          min((w + 1) * shards_per_wave, cfg.n_shards))
         if s not in done]
        for w in range(waves)) if ws]
    manifest_fut = None
    for i, wave_shards in enumerate(wave_lists):
        wave_docs = docs.filter(F.col("shard").isin(wave_shards))
        tf_src = tokenize_docs(
            wave_docs.select("doc_id", text_col),
            code_aware=code_aware, text_col=text_col,
            tokenizer=tokenizer, positions=positions,
        ).withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
        )
        # shuffle on (shard, term-bucket): doc-hash sharding keeps task
        # sizes uniform (hot TERMS cannot skew a doc-partitioned build);
        # the term sub-bucket spreads the sort+compress stage over every
        # task slot when shards < cores (see _sorted_runs_frame).
        sorted_runs, bucketed = _sorted_runs_frame(tf_src, wave_shards, par)
        blocks = sorted_runs.mapInPandas(
            lambda it: _compress_runs(it, cfg.block_size,
                                      with_positions=positions),
            schema=BLOCKS_SCHEMA,
        )
        if bucketed:
            # gather compressed blocks to one sorted file per shard dir
            # (read-side layout; see _sorted_runs_frame)
            blocks = blocks.repartition(
                len(wave_shards), "shard"
            ).sortWithinPartitions("shard", "term", "block_id")
        # dynamic partition overwrite, NOT append: a crash in the window
        # between the postings commit and append_manifest leaves the wave
        # un-manifested; the resume rebuilds it, and overwrite replaces
        # the stale shard=s dirs instead of appending duplicate blocks
        # (duplicated postings would double exact scores and inflate WAND).
        (blocks.write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(out_dir, "postings")))
        _mark(f"wave{i}_tokenize_compress_write")
        if shard_counts is None:
            shard_counts = docs_fut.result()

        def _manifest_job(ws=wave_shards, idx=i) -> None:
            # manifest from read-back: certifies disk state (checkpoint.py)
            written = spark.read.parquet(
                os.path.join(out_dir, "postings")
            ).filter(F.col("shard").isin(ws))
            ndocs_expr = F.coalesce(
                *[F.when(F.col("shard") == s,
                         F.lit(int(shard_counts.get(s, 0))))
                  for s in ws],
                F.lit(0),
            )
            append_manifest(
                shard_metrics(written).select(
                    "shard",
                    ndocs_expr.cast("long").alias("n_docs"),
                    "n_postings", "n_blocks", "bytes_compressed",
                    "content_fingerprint", "n_terms",
                ),
                out_dir,
            )
            _mark(f"wave{idx}_manifest")

        if i == len(wave_lists) - 1:
            # final wave: the manifest read-back and the metadata-derived
            # term_df/stats below both read the now-committed postings —
            # independent jobs, overlap them (guide §2.6). stats.json (the
            # commit marker) is only written after the manifest lands.
            manifest_fut = pool.submit(_manifest_job)
        else:
            _manifest_job()
    if shard_counts is None:
        shard_counts = docs_fut.result()

    # ---- term dictionary + corpus stats from block METADATA (read-back:
    # certifies disk, like the manifest). Block rows are pre-aggregated
    # per (shard, term): df(term) = Σ n_docs, Σdl = Σ sum_tf — a
    # column-pruned scan of (term, n_docs, sum_tf) that never touches the
    # compressed binary columns. Skew is handled STRUCTURALLY: the
    # map-side partial agg runs per shard partition, so even a term
    # present in every document contributes at most n_shards partial rows
    # to the final shuffle — no salting, no measured hot list needed on
    # this path (doc_freqs keeps both for tf-table consumers).
    postings_dir = os.path.join(out_dir, "postings")
    n_docs_total = sum(shard_counts.values())
    if os.path.exists(postings_dir):
        # mergeSchema: a resumed build can keep shards written by an older
        # engine whose blocks predate the sum_tf column — footer-sampled
        # schema would then silently yield nulls for those files and
        # undercount sum_dl (skewing avgdl/BM25). Merge schemas and fail
        # LOUDLY on any null sum_tf instead of serving wrong stats.
        meta = spark.read.option("mergeSchema", "true").parquet(postings_dir)
        if "sum_tf" not in meta.columns:
            raise ValueError(
                f"postings under {postings_dir} carry no sum_tf column "
                "(pre-positions-era schema); rebuild with resume=False"
            )
        tdf = meta.groupBy("term").agg(
            F.sum("n_docs").cast("long").alias("df"))
        tdf.write.mode("overwrite").parquet(os.path.join(out_dir, "term_df"))
        agg = meta.agg(
            F.sum("sum_tf").alias("s"),
            F.sum(F.when(F.col("sum_tf").isNull(), 1).otherwise(0))
            .alias("n_null"),
        ).collect()[0]
        if int(agg["n_null"] or 0) > 0:
            raise ValueError(
                f"{int(agg['n_null'])} block rows under {postings_dir} have "
                "null sum_tf (mixed-schema postings: some shards predate "
                "the sum_tf column); rebuild those shards (resume=False) "
                "before trusting metadata-derived stats"
            )
        sum_dl_total = int(agg["s"] or 0)
    else:  # corpus tokenized to nothing at all
        from dp_search_data_importer_spark.session import local_df

        local_df(spark, [], "term string, df long").write.mode(
            "overwrite").parquet(os.path.join(out_dir, "term_df"))
        sum_dl_total = 0
    _mark("term_df_write")

    stats = {
        "n_docs": int(n_docs_total),
        "sum_dl": int(sum_dl_total),  # exact int: incremental upserts
        # adjust it by ±deltas instead of reconstructing from float avgdl
        "avgdl": float(sum_dl_total / n_docs_total) if n_docs_total else 0.0,
        "k1": cfg.k1, "b": cfg.b,
        "block_size": cfg.block_size, "n_shards": cfg.n_shards,
        "code_aware": code_aware,
        "positions": positions,
        "shard_docs": {int(s): int(n) for s, n in shard_counts.items()},
    }
    stats["hot_terms"] = hot_terms(
        spark.read.parquet(os.path.join(out_dir, "term_df")),
        n_docs_total, cfg,
    )
    # stats.json is written LAST — its presence plus a full manifest is the
    # build's commit marker (resume returns early on it above), so join the
    # overlapped final-wave manifest before writing it
    if manifest_fut is not None:
        manifest_fut.result()
    pool.shutdown(wait=True)
    write_stats_json(out_dir, stats)
    return stats
