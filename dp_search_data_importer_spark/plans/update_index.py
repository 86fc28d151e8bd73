"""Incremental index upsert — the reference's continuous-import semantics
applied to the native index.

The reference's whole job is a forever-stream of documents keyed by uid
flowing into the search index as idempotent upserts
(``/root/reference/handler/handler.go:133-155`` ``doc_as_upsert``); its index
maintenance is delegated to Elasticsearch. This module is the Spark-native
equivalent for OUR index: a batch of new/changed documents updates the
sharded postings WITHOUT touching unaffected shards.

Design (all shard-local, batch-proportional):

1. new docs hash to shards exactly like the build; only those shards'
   postings are read back (decompress_blocks) — the rest of the index is
   never scanned;
2. replaced docs' rows are dropped (keyed last-writer-wins, like
   ``doc_as_upsert``), the batch's tf rows union in, and the affected
   shards recompress deterministically — the SAME sort + block layout as a
   fresh build, so the result is byte-identical to rebuilding the merged
   corpus from scratch (property-tested);
3. corpus statistics update by exact integer deltas (n_docs, Σdl, per-term
   df). Block metadata is avgdl-free (impacts — see
   ``build_index.block_impacts``), so a drifting avgdl never invalidates
   bounds baked into untouched shards; queries always score with the
   CURRENT stats, exactly like Lucene applying norms at search time;
4. **crash-atomic multi-artifact commit**: every new artifact (postings
   shard dirs, docs shard dirs, term_df, manifest, stats.json) is STAGED
   under ``_upsert_stage/`` while the live index is only read; a
   ``_COMMIT.json`` marker is written last, and only then are live dirs
   swapped in via backup-rename. :func:`recover_index` (called on entry to
   every upsert) rolls an interrupted commit forward when the marker
   exists — every staged artifact lands — and rolls it back (discards the
   stage) when it does not, so the live index is always EITHER the
   pre-batch state or the post-batch state, never a mix with drifted
   stats. Same discipline as ``streaming.ingest_stream.recover_store``.

A shard whose merged content tokenizes to zero terms is handled explicitly:
its live ``postings/shard=k`` dir is DELETED during the swap (recorded in
the commit marker), matching a fresh rebuild where the shard would simply
emit no blocks — dynamic partition overwrite alone would have left the
stale dir searchable.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.checkpoint import (
    read_stats_json,
    shard_metrics,
)
from dp_search_data_importer_spark.config import EngineConfig
from dp_search_data_importer_spark.operators.ingest import normalize_repo_files
from dp_search_data_importer_spark.plans.build_index import (
    BLOCKS_SCHEMA,
    _compress_runs,
    tokenize_docs,
)
from dp_search_data_importer_spark.plans.query import (
    decompress_blocks,
    load_blocks,
)

_STAGE = "_upsert_stage"
_COMMIT = "_COMMIT.json"
_OLD = "_old_"  # backup prefix, flattened names at the index root
_LOCKNAME = "_COMMIT.lock"


def apply_commit_locked(root: str, marker: str, apply_fn,
                        wait_s: float = 120.0,
                        stale_s: float = 60.0) -> bool:
    """Serialize commit application across processes (ADVICE r4 medium):
    read-path self-healing made every reader a potential writer, and two
    concurrent appliers racing the same rename sequence can throw
    FileNotFoundError spuriously. An ``O_EXCL`` lockfile at the store
    root claims the commit; losers wait for the marker to disappear
    (the winner applies and removes it) instead of racing.

    Crash-safety: a holder that dies leaves the lockfile behind — locks
    older than ``stale_s`` are broken and re-claimed (``apply_fn`` is an
    idempotent rename-based roll-forward, so a second application after
    a genuine crash is safe; the staleness threshold only guards against
    stealing from a LIVE, slow applier). Returns True iff THIS process
    applied the commit; False when another process finished it first."""
    import time

    lock = os.path.join(root, _LOCKNAME)
    deadline = time.monotonic() + wait_s
    while True:
        if not os.path.exists(marker):
            return False
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                age = time.time() - os.stat(lock).st_mtime
            except OSError:
                continue  # lock vanished: re-contend immediately
            if age > stale_s:
                try:
                    os.remove(lock)
                except OSError:
                    pass
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"commit lock {lock} held past {wait_s}s while marker "
                    f"{marker} persists — applier stuck?")
            time.sleep(0.05)
            continue
        try:
            os.write(fd, str(os.getpid()).encode())
        finally:
            os.close(fd)
        try:
            if not os.path.exists(marker):  # raced: winner already applied
                return False
            with open(marker) as f:
                meta = json.load(f)
            apply_fn(meta)
            return True
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass


def _stage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, _STAGE)


def _backup(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, _OLD + name)


def _swap_dir(live: str, staged: str, backup: str) -> None:
    """Replace ``live`` with ``staged`` via backup-rename; idempotent under
    re-execution after a crash at any point (roll-forward)."""
    if os.path.exists(staged):
        if os.path.exists(live):
            os.rename(live, backup)
        os.rename(staged, live)
    if os.path.exists(backup):
        # either the swap above just completed, or a previous attempt
        # crashed after staged→live: the new data is live, drop the backup
        if os.path.exists(live):
            shutil.rmtree(backup)
        else:  # crash between the two renames: restore
            os.rename(backup, live)


def _delete_dir(live: str, backup: str) -> None:
    """Remove ``live`` (rename-first so a crash mid-delete can't leave a
    half-deleted dir looking live); idempotent."""
    if os.path.exists(live):
        os.rename(live, backup)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def _apply_commit(out_dir: str, meta: dict) -> None:
    """Roll a fully-staged upsert forward. Safe to re-run from any crash
    point: every step is an idempotent rename-based swap."""
    stage = _stage_dir(out_dir)
    for s in meta["replace_postings"]:
        _swap_dir(os.path.join(out_dir, "postings", f"shard={s}"),
                  os.path.join(stage, "postings", f"shard={s}"),
                  _backup(out_dir, f"postings_shard_{s}"))
    for s in meta["delete_postings"]:
        _delete_dir(os.path.join(out_dir, "postings", f"shard={s}"),
                    _backup(out_dir, f"postings_shard_{s}"))
    for s in meta["affected"]:
        _swap_dir(os.path.join(out_dir, "docs", f"shard={s}"),
                  os.path.join(stage, "docs", f"shard={s}"),
                  _backup(out_dir, f"docs_shard_{s}"))
    for s in meta.get("delete_docs_shards", []):
        # a delete that empties a shard stages no docs dir for it — the
        # live dir must go explicitly (same reasoning as delete_postings)
        _delete_dir(os.path.join(out_dir, "docs", f"shard={s}"),
                    _backup(out_dir, f"docs_shard_{s}"))
    _swap_dir(os.path.join(out_dir, "term_df"),
              os.path.join(stage, "term_df"), _backup(out_dir, "term_df"))
    _swap_dir(os.path.join(out_dir, "_manifest"),
              os.path.join(stage, "manifest"), _backup(out_dir, "manifest"))
    if meta.get("drop_positions"):
        # the sidecar was built from a previous corpus; a stale sidecar
        # silently serves phrase matches for replaced content (ADVICE r2)
        _delete_dir(os.path.join(out_dir, "positions"),
                    _backup(out_dir, "positions"))
    staged_stats = os.path.join(stage, "stats.json")
    if os.path.exists(staged_stats):
        os.replace(staged_stats, os.path.join(out_dir, "stats.json"))
    os.remove(os.path.join(stage, _COMMIT))
    shutil.rmtree(stage, ignore_errors=True)


def recover_for_read(out_dir: str) -> bool:
    """The read-safe half of :func:`recover_index`: roll an interrupted
    commit FORWARD iff the commit marker exists, else do nothing.

    Called from every query/stats entry point (``plans.query.load_blocks``
    / ``expand_terms``, ``checkpoint.read_stats_json``) so a crash inside
    :func:`_apply_commit` can never leave queries serving a MIXED pre/post
    index until the next upsert happens — the 'never a mix' guarantee
    holds for readers too. Unlike :func:`recover_index` this never rolls
    BACK: a marker-less stage may belong to an upsert that is still
    staging, and readers must not destroy it (the live index is untouched
    until the marker lands, so it is consistent regardless). Cost in the
    common case: one ``os.path.exists``. Application is serialized via
    :func:`apply_commit_locked`, so concurrent readers (or a reader
    racing the writer) can't race the rename sequence. Returns True iff
    a roll-forward happened (by this process or a concurrent one while
    we waited).
    """
    marker = os.path.join(_stage_dir(out_dir), _COMMIT)
    if not os.path.exists(marker):
        return False
    apply_commit_locked(out_dir, marker,
                        lambda meta: _apply_commit(out_dir, meta))
    return True


def recover_index(out_dir: str) -> str:
    """Repair an upsert interrupted at any point. Returns the action taken:
    ``"forward"`` (commit marker present → finish the swap), ``"back"``
    (staging incomplete → discard it), or ``"clean"``. Idempotent; called
    on entry to every :func:`upsert_docs`."""
    stage = _stage_dir(out_dir)
    marker = os.path.join(stage, _COMMIT)
    if os.path.exists(marker):
        apply_commit_locked(out_dir, marker,
                            lambda meta: _apply_commit(out_dir, meta))
        return "forward"
    acted = False
    if os.path.exists(out_dir):
        # stray backups can only exist post-marker; restore any whose live
        # dir is missing (crash inside a swap), then drop the rest
        for name in sorted(os.listdir(out_dir)):
            if not name.startswith(_OLD):
                continue
            acted = True
            suffix = name[len(_OLD):]
            if suffix.startswith("postings_shard_"):
                live = os.path.join(out_dir, "postings",
                                    f"shard={suffix.rsplit('_', 1)[1]}")
            elif suffix.startswith("docs_shard_"):
                live = os.path.join(out_dir, "docs",
                                    f"shard={suffix.rsplit('_', 1)[1]}")
            elif suffix == "manifest":
                live = os.path.join(out_dir, "_manifest")
            else:
                live = os.path.join(out_dir, suffix)
            backup = os.path.join(out_dir, name)
            if os.path.exists(live):
                shutil.rmtree(backup)
            else:
                os.rename(backup, live)
    if os.path.exists(stage):
        shutil.rmtree(stage)
        return "back"
    return "back" if acted else "clean"


def upsert_docs(
    spark: SparkSession,
    out_dir: str,
    new_docs: DataFrame,
    *,
    already_normalized: bool = False,
    tokenizer: str = "arrow",
    text_col: str = "content",
) -> dict:
    """Apply a batch of new/changed documents to the index at ``out_dir``.

    Keyed upsert on doc_id (an existing doc with the same id is replaced;
    duplicates within the batch collapse to one row). Returns accounting:
    {received, upserted, replaced, added, affected_shards} — the A9 twin.

    The live index is only READ until every new artifact is staged and the
    commit marker is written (see module docstring); a crash anywhere
    leaves an index that :func:`recover_index` restores to exactly the
    pre-batch or post-batch state.
    """
    recover_index(out_dir)
    stats = read_stats_json(out_dir)
    cfg = EngineConfig(n_shards=stats["n_shards"],
                       block_size=stats["block_size"],
                       k1=stats["k1"], b=stats["b"])
    code_aware = bool(stats.get("code_aware", False))
    has_pos = bool(stats.get("positions", False))

    batch = new_docs if already_normalized else normalize_repo_files(new_docs)
    batch = batch.dropDuplicates(["doc_id"]).withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
    )
    received = new_docs.count()

    stage = _stage_dir(out_dir)
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    # stage the batch once (several consumers: ids, tf, docs rows)
    batch_tmp = os.path.join(stage, "batch")
    batch.write.mode("overwrite").parquet(batch_tmp)
    batch = spark.read.parquet(batch_tmp)
    try:
        affected = sorted(
            r["shard"] for r in batch.select("shard").distinct().collect()
        )
        if not affected:
            return {"received": int(received), "upserted": 0, "replaced": 0,
                    "added": 0, "affected_shards": []}
        new_ids = batch.select("doc_id")

        # ---- old state of the affected shards only (reads live postings —
        # safe: nothing live is mutated until the commit marker lands)
        old_tf = decompress_blocks(
            load_blocks(spark, out_dir).filter(F.col("shard").isin(affected)),
            include_positions=has_pos,
        ).withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
        )
        docs_store = spark.read.parquet(os.path.join(out_dir, "docs"))
        old_docs = docs_store.filter(F.col("shard").isin(affected))
        n_replaced = old_docs.join(new_ids, "doc_id", "left_semi").count()

        removed_tf = old_tf.join(new_ids, "doc_id", "left_semi")
        kept_tf = old_tf.join(new_ids, "doc_id", "left_anti")
        new_tf = tokenize_docs(
            batch, code_aware=code_aware, text_col=text_col,
            tokenizer=tokenizer, positions=has_pos,
        ).withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int")
        )

        # ---- exact integer stat deltas (one small agg each, over
        # batch/affected-shard-sized data only); staged so their lineage
        # never depends on live postings at swap time
        removed_sum_dl = removed_tf.agg(F.sum("tf")).collect()[0][0] or 0
        new_sum_dl = new_tf.agg(F.sum("tf")).collect()[0][0] or 0
        deltas_tmp = os.path.join(stage, "df_deltas")
        (removed_tf.groupBy("term").agg(F.count(F.lit(1)).alias("removed"))
         .write.mode("overwrite").parquet(os.path.join(deltas_tmp, "removed")))
        (new_tf.groupBy("term").agg(F.count(F.lit(1)).alias("added"))
         .write.mode("overwrite").parquet(os.path.join(deltas_tmp, "added")))
        removed_df = spark.read.parquet(os.path.join(deltas_tmp, "removed"))
        added_df = spark.read.parquet(os.path.join(deltas_tmp, "added"))

        # ---- stage merged tf, recompress ONLY the affected shards, stage
        # the resulting shard dirs (a shard with zero merged rows stages no
        # dir → recorded for explicit deletion in the commit marker)
        merged_tmp = os.path.join(stage, "tf")
        kept_tf.unionByName(new_tf).write.mode("overwrite").parquet(merged_tmp)
        merged = spark.read.parquet(merged_tmp)
        sorted_runs = merged.repartition(
            len(affected), "shard"
        ).sortWithinPartitions("shard", "term", "doc_id")
        blocks = sorted_runs.mapInPandas(
            lambda it: _compress_runs(it, cfg.block_size,
                                      with_positions=has_pos),
            schema=BLOCKS_SCHEMA,
        )
        staged_postings = os.path.join(stage, "postings")
        (blocks.write.mode("overwrite").partitionBy("shard")
         .parquet(staged_postings))
        staged_shards = {
            int(d.split("=", 1)[1]) for d in os.listdir(staged_postings)
            if d.startswith("shard=")
        }
        replace_postings = sorted(staged_shards)
        delete_postings = sorted(set(affected) - staged_shards)

        # ---- docs/: replaced rows out, batch rows in (affected shards only)
        doc_cols = [c for c in docs_store.columns if c != "shard"] + ["shard"]
        batch_doc_rows = batch.select(
            *[c for c in doc_cols if c in batch.columns])
        kept_docs = old_docs.join(new_ids, "doc_id", "left_anti").select(
            *batch_doc_rows.columns)
        (kept_docs.unionByName(batch_doc_rows)
         .repartition(len(affected), "shard")
         .write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(stage, "docs")))

        # ---- term_df: exact df deltas
        old_df = spark.read.parquet(os.path.join(out_dir, "term_df"))
        updated_df = (
            old_df.join(removed_df, "term", "full")
            .join(added_df, "term", "full")
            .select(
                "term",
                (F.coalesce(F.col("df"), F.lit(0))
                 - F.coalesce(F.col("removed"), F.lit(0))
                 + F.coalesce(F.col("added"), F.lit(0))).alias("df"),
            )
            .filter(F.col("df") > 0)
        )
        updated_df.write.mode("overwrite").parquet(
            os.path.join(stage, "term_df"))

        # ---- stats.json (staged) — per-shard counts from the STAGED docs
        n_new = batch.count()
        per_shard_new = {
            int(r["shard"]): int(r["n"]) for r in
            spark.read.parquet(os.path.join(stage, "docs"))
            .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        shard_docs = {int(k): int(v)
                      for k, v in stats.get("shard_docs", {}).items()}
        shard_docs.update(per_shard_new)
        n_docs = stats["n_docs"] + n_new - n_replaced
        sum_dl = int(stats.get("sum_dl",
                               round(stats["avgdl"] * stats["n_docs"])))
        sum_dl += int(new_sum_dl) - int(removed_sum_dl)
        stats.update({
            "n_docs": int(n_docs),
            "sum_dl": int(sum_dl),
            "avgdl": float(sum_dl / n_docs) if n_docs else 0.0,
            "shard_docs": shard_docs,
        })
        with open(os.path.join(stage, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2, sort_keys=True)

        # ---- manifest (staged): unaffected rows + read-back of the staged
        # shards; a deleted (zero-term) shard gets no row, exactly like a
        # fresh build where it emits no blocks
        old_manifest = spark.read.parquet(
            os.path.join(out_dir, "_manifest")).filter(
            ~F.col("shard").isin(affected))
        if replace_postings:
            written = spark.read.parquet(staged_postings)
            ndocs_expr = F.coalesce(
                *[F.when(F.col("shard") == s, F.lit(shard_docs.get(s, 0)))
                  for s in replace_postings],
                F.lit(0),
            )
            new_rows = shard_metrics(written).select(
                "shard", ndocs_expr.cast("long").alias("n_docs"),
                "n_postings", "n_blocks", "bytes_compressed",
                "content_fingerprint", "n_terms",
            )
            staged_manifest = old_manifest.unionByName(new_rows)
        else:
            staged_manifest = old_manifest
        staged_manifest.write.mode("overwrite").parquet(
            os.path.join(stage, "manifest"))

        # ---- COMMIT: marker last, then swap (roll-forward-able from here)
        meta = {
            "affected": affected,
            "replace_postings": replace_postings,
            "delete_postings": delete_postings,
            "drop_positions": os.path.exists(
                os.path.join(out_dir, "positions")),
        }
        with open(os.path.join(stage, _COMMIT), "w") as f:
            json.dump(meta, f)
        # the writer contends under the same lock as self-healing readers
        apply_commit_locked(out_dir, os.path.join(stage, _COMMIT),
                            lambda m: _apply_commit(out_dir, m))

        return {"received": int(received), "upserted": int(n_new),
                "replaced": int(n_replaced),
                "added": int(n_new - n_replaced),
                "affected_shards": affected}
    finally:
        # clean up only if the commit marker never landed (pure staging
        # failure → rollback). A stage WITH a marker must survive so the
        # next upsert's recover_index rolls the half-applied commit forward.
        if not os.path.exists(os.path.join(stage, _COMMIT)):
            shutil.rmtree(stage, ignore_errors=True)


def delete_docs(spark: SparkSession, out_dir: str, ids: DataFrame, *,
                id_col: str = "doc_id") -> dict:
    """Keyed delete — the removal half of the CRUD surface (ES
    ``_delete_by_query`` lands here after matching; direct id deletes are
    the ES ``DELETE /index/_doc/{id}`` twin). Same staged-commit protocol
    as :func:`upsert_docs`: only the shards holding deleted docs are read
    back and recompressed; corpus stats update by exact integer deltas;
    a crash at any point leaves the pre- or post-delete index, never a
    mix. Unknown ids are ignored (idempotent redelivery). A shard whose
    LAST doc is deleted loses its postings dir, docs dir, manifest row,
    and shard_docs entry — artifact-identical to a fresh build of the
    surviving corpus (property-tested).

    Returns {requested, deleted, not_found, affected_shards}.
    """
    recover_index(out_dir)
    stats = read_stats_json(out_dir)
    cfg = EngineConfig(n_shards=stats["n_shards"],
                       block_size=stats["block_size"],
                       k1=stats["k1"], b=stats["b"])
    has_pos = bool(stats.get("positions", False))

    ids_df = (ids.select(F.col(id_col).cast("long").alias("doc_id"))
              .dropDuplicates(["doc_id"]))
    requested = ids_df.count()
    docs_store = spark.read.parquet(os.path.join(out_dir, "docs"))

    stage = _stage_dir(out_dir)
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    # freeze the delete set's lineage on disk: nothing downstream may
    # depend on the live docs dir at swap time
    present_tmp = os.path.join(stage, "delete_ids")
    (docs_store.join(ids_df, "doc_id", "left_semi")
     .select("doc_id", "shard")
     .write.mode("overwrite").parquet(present_tmp))
    present = spark.read.parquet(present_tmp)
    try:
        affected = sorted(
            r["shard"] for r in present.select("shard").distinct().collect())
        n_deleted = present.count()
        if not affected:
            return {"requested": int(requested), "deleted": 0,
                    "not_found": int(requested), "affected_shards": []}
        del_ids = present.select("doc_id")

        old_tf = decompress_blocks(
            load_blocks(spark, out_dir).filter(F.col("shard").isin(affected)),
            include_positions=has_pos,
        ).withColumn(
            "shard", F.pmod(F.col("doc_id"), F.lit(cfg.n_shards)).cast("int"))
        removed_tf = old_tf.join(del_ids, "doc_id", "left_semi")
        kept_tf = old_tf.join(del_ids, "doc_id", "left_anti")

        removed_sum_dl = removed_tf.agg(F.sum("tf")).collect()[0][0] or 0
        removed_tmp = os.path.join(stage, "df_deltas", "removed")
        (removed_tf.groupBy("term").agg(F.count(F.lit(1)).alias("removed"))
         .write.mode("overwrite").parquet(removed_tmp))
        removed_df = spark.read.parquet(removed_tmp)

        # surviving tf of the affected shards recompresses with the SAME
        # sort + block layout as a fresh build (byte-identical result)
        merged_tmp = os.path.join(stage, "tf")
        kept_tf.write.mode("overwrite").parquet(merged_tmp)
        merged = spark.read.parquet(merged_tmp)
        sorted_runs = merged.repartition(
            len(affected), "shard"
        ).sortWithinPartitions("shard", "term", "doc_id")
        blocks = sorted_runs.mapInPandas(
            lambda it: _compress_runs(it, cfg.block_size,
                                      with_positions=has_pos),
            schema=BLOCKS_SCHEMA)
        staged_postings = os.path.join(stage, "postings")
        (blocks.write.mode("overwrite").partitionBy("shard")
         .parquet(staged_postings))
        staged_shards = {
            int(d.split("=", 1)[1]) for d in os.listdir(staged_postings)
            if d.startswith("shard=")}
        replace_postings = sorted(staged_shards)
        delete_postings = sorted(set(affected) - staged_shards)

        # docs/: survivors only; a shard with no survivors stages no dir
        kept_docs = (docs_store.filter(F.col("shard").isin(affected))
                     .join(del_ids, "doc_id", "left_anti"))
        (kept_docs.repartition(len(affected), "shard")
         .write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(stage, "docs")))
        staged_docs = os.path.join(stage, "docs")
        # a partitionBy write with zero survivors emits only _SUCCESS —
        # no partition dirs, no schema to infer — so gate on the dirs
        has_doc_parts = os.path.exists(staged_docs) and any(
            x.startswith("shard=") for x in os.listdir(staged_docs))
        per_shard_new = {
            int(r["shard"]): int(r["n"]) for r in
            spark.read.parquet(staged_docs)
            .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        } if has_doc_parts else {}
        delete_docs_shards = sorted(set(affected) - set(per_shard_new))

        # term_df: exact df deltas (removals only)
        old_df = spark.read.parquet(os.path.join(out_dir, "term_df"))
        updated_df = (
            old_df.join(removed_df, "term", "left")
            .select("term",
                    (F.col("df") - F.coalesce(F.col("removed"), F.lit(0)))
                    .alias("df"))
            .filter(F.col("df") > 0))
        updated_df.write.mode("overwrite").parquet(
            os.path.join(stage, "term_df"))

        # stats.json: integer deltas; an emptied shard keeps an explicit
        # 0 entry — a fresh build's docs-write observation records every
        # shard 0..n_shards-1 including zero-doc ones (build_index.py:379)
        shard_docs = {int(k): int(v)
                      for k, v in stats.get("shard_docs", {}).items()}
        shard_docs.update(per_shard_new)
        for s in delete_docs_shards:
            shard_docs[s] = 0
        n_docs = stats["n_docs"] - int(n_deleted)
        sum_dl = int(stats.get("sum_dl",
                               round(stats["avgdl"] * stats["n_docs"])))
        sum_dl -= int(removed_sum_dl)
        stats.update({
            "n_docs": int(n_docs),
            "sum_dl": int(sum_dl),
            "avgdl": float(sum_dl / n_docs) if n_docs else 0.0,
            "shard_docs": shard_docs,
        })
        with open(os.path.join(stage, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2, sort_keys=True)

        # manifest: unaffected rows + read-back of the staged shards
        old_manifest = spark.read.parquet(
            os.path.join(out_dir, "_manifest")).filter(
            ~F.col("shard").isin(affected))
        if replace_postings:
            written = spark.read.parquet(staged_postings)
            ndocs_expr = F.coalesce(
                *[F.when(F.col("shard") == s, F.lit(shard_docs.get(s, 0)))
                  for s in replace_postings],
                F.lit(0))
            new_rows = shard_metrics(written).select(
                "shard", ndocs_expr.cast("long").alias("n_docs"),
                "n_postings", "n_blocks", "bytes_compressed",
                "content_fingerprint", "n_terms")
            staged_manifest = old_manifest.unionByName(new_rows)
        else:
            staged_manifest = old_manifest
        staged_manifest.write.mode("overwrite").parquet(
            os.path.join(stage, "manifest"))

        meta = {
            "affected": affected,
            "replace_postings": replace_postings,
            "delete_postings": delete_postings,
            "delete_docs_shards": delete_docs_shards,
            "drop_positions": os.path.exists(
                os.path.join(out_dir, "positions")),
        }
        with open(os.path.join(stage, _COMMIT), "w") as f:
            json.dump(meta, f)
        apply_commit_locked(out_dir, os.path.join(stage, _COMMIT),
                            lambda m: _apply_commit(out_dir, m))

        return {"requested": int(requested), "deleted": int(n_deleted),
                "not_found": int(requested - n_deleted),
                "affected_shards": affected}
    finally:
        if not os.path.exists(os.path.join(stage, _COMMIT)):
            shutil.rmtree(stage, ignore_errors=True)


def match_ids(spark: SparkSession, out_dir: str, text: str, *,
              operator: str = "or") -> DataFrame | None:
    """Full ``match``-query hit set (doc_id frame, not top-k) against the
    stored index — the shared matching phase of ``_delete_by_query`` and
    query-filtered ``_reindex``. Candidates come from the term-pruned
    postings scan — never a corpus scan — and membership is one grouped
    aggregation, so matching scales exactly like the query path. Returns
    ``None`` when the query tokenizes to nothing."""
    from dp_search_data_importer_spark.operators.bm25 import query_terms

    if operator not in ("or", "and"):
        raise ValueError("operator must be 'or' or 'and'")
    stats = read_stats_json(out_dir)
    from dp_search_data_importer_spark.session import local_df

    queries = local_df(spark, [(0, text)],
                       "query_id long, query_text string")
    qt = query_terms(queries, code_aware=bool(stats.get("code_aware",
                                                        False)))
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    if not terms:
        return None
    tf = decompress_blocks(load_blocks(spark, out_dir, terms))
    matched = (tf.join(F.broadcast(qt.select("term").distinct()), "term")
               .groupBy("doc_id")
               .agg(F.countDistinct("term").alias("m")))
    need = len(terms) if operator == "and" else 1
    return matched.filter(F.col("m") >= F.lit(need)).select("doc_id")


def delete_by_query(spark: SparkSession, out_dir: str, text: str, *,
                    operator: str = "or") -> dict:
    """ES ``_delete_by_query`` twin for a ``match`` query against the
    stored index: the full hit set (not top-k) feeds :func:`delete_docs`.
    ``operator="or"`` deletes docs containing ANY query term (the ES
    match default); ``"and"`` requires every distinct term."""
    ids = match_ids(spark, out_dir, text, operator=operator)
    if ids is None:
        return {"requested": 0, "deleted": 0, "not_found": 0,
                "affected_shards": []}
    return delete_docs(spark, out_dir, ids)


def update_by_query(spark: SparkSession, out_dir: str, text: str,
                    assignments: dict, *, operator: str = "or") -> dict:
    """ES ``_update_by_query`` twin for METADATA fields: every doc in the
    full ``match`` hit set gets ``assignments`` applied — each value is a
    plain literal or ``{"script": source, "params": {...}}`` in the
    restricted Painless subset (``plans/painless``; ``doc['f'].value``
    reads the doc's CURRENT fields, as ``ctx._source.f`` does in ES).

    Only non-identity metadata columns are updatable: ``doc_id``/``shard``
    key the index, ``repo``/``path``/``commit`` derive the doc_id, and
    ``content_sha256`` attests the source bytes — assigning any of them is
    refused (in ES too, reindexing is how identity changes; that twin is
    :func:`plans.reindex.reindex`). Content changes go through
    :func:`upsert_docs`, the reference's ``doc_as_upsert``.

    Same staged-commit protocol as upsert/delete, restricted to the docs
    dirs of affected shards: postings, term_df, manifest, and stats are
    untouched (metadata never feeds the postings), so the commit is
    docs-shard swaps only — batch-proportional, crash-atomic, idempotent
    under redelivery (assignments are absolute, not increments).

    Returns {matched, updated, affected_shards}.
    """
    recover_index(out_dir)
    ids = match_ids(spark, out_dir, text, operator=operator)
    if ids is None:
        return {"matched": 0, "updated": 0, "affected_shards": []}
    docs_store = spark.read.parquet(os.path.join(out_dir, "docs"))
    immutable = {"doc_id", "shard", "repo", "path", "commit",
                 "content_sha256"}
    for col in assignments:
        if col in immutable:
            raise ValueError(f"column {col!r} is part of the document "
                             "identity/integrity contract; use reindex "
                             "or upsert_docs instead")
        if col not in docs_store.columns:
            raise ValueError(f"unknown docs column: {col!r}")

    stage = _stage_dir(out_dir)
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    present_tmp = os.path.join(stage, "update_ids")
    (docs_store.join(ids, "doc_id", "left_semi")
     .select("doc_id", "shard")
     .write.mode("overwrite").parquet(present_tmp))
    present = spark.read.parquet(present_tmp)
    try:
        affected = sorted(
            r["shard"] for r in present.select("shard").distinct().collect())
        n_matched = present.count()
        if not affected:
            return {"matched": 0, "updated": 0, "affected_shards": []}

        upd = (docs_store.filter(F.col("shard").isin(affected))
               .join(present.select("doc_id", F.lit(1).alias("_hit")),
                     "doc_id", "left"))
        for col, val in assignments.items():
            if isinstance(val, dict) and "script" in val:
                from dp_search_data_importer_spark.plans.painless import (
                    compile_script,
                )

                new_col, _ = compile_script(
                    val["script"], val.get("params"), F.lit(0.0), F.col)
            else:
                new_col = F.lit(val)
            upd = upd.withColumn(
                col, F.when(F.col("_hit") == 1,
                            new_col.cast(dict(upd.dtypes)[col]))
                .otherwise(F.col(col)))
        (upd.drop("_hit").repartition(len(affected), "shard")
         .write.mode("overwrite").partitionBy("shard")
         .parquet(os.path.join(stage, "docs")))

        meta = {"replace_postings": [], "delete_postings": [],
                "affected": affected, "drop_positions": False}
        with open(os.path.join(stage, _COMMIT), "w") as f:
            json.dump(meta, f)
        apply_commit_locked(out_dir, os.path.join(stage, _COMMIT),
                            lambda m: _apply_commit(out_dir, m))
        return {"matched": int(n_matched), "updated": int(n_matched),
                "affected_shards": affected}
    finally:
        if not os.path.exists(os.path.join(stage, _COMMIT)):
            shutil.rmtree(stage, ignore_errors=True)
