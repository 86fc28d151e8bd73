"""Incremental keyed upsert for the ANN vector stores — the
``doc_as_upsert`` discipline (``/root/reference/handler/handler.go:133-155``)
applied to the bucket/cell-partitioned similarity indexes, mirroring the
postings index's crash-atomic protocol (``plans/update_index.py``).

All three store families upsert through one code path, dispatched on the
store's own metadata file:

- hyperplane-LSH store (``_planes.json``, partitioned by ``bucket``)
- IVF store (``_centroids.json``, partitioned by ``cell``)
- IVF-PQ / residual IVF-PQ store (``_quantizers.json``, partitioned by
  ``cell``; codes-only, no vectors on disk)

**Quantizers stay frozen across upserts** — new vectors are assigned/encoded
with the STORED planes/centroids/codebooks, exactly like Lucene segments
keep their analyzer: that is what makes the upserted store byte-equivalent
to a fresh rebuild with the same quantizers (property-tested). Re-train
trigger is the caller's policy; the accounting dict returns
``fraction_new`` so a pipeline can rebuild (retrain + write_*_index) once
cumulative drift passes its threshold — recall degrades gradually as the
data distribution leaves the frozen quantizer behind, it never turns
incorrect.

Scale shape: the batch assigns/encodes in one Arrow pass; the only
store-sized read is a column-pruned (vec_id, part) scan to locate moved
keys (a replaced vector may re-assign to a DIFFERENT cell — both its old
and new partitions rewrite); merged partitions rewrite one task per
partition dir. Crash-atomic multi-dir commit: everything stages under
``_upsert_stage/``, a ``_COMMIT.json`` marker lands last, rename-based
swaps apply it; :func:`recover_ann` rolls forward (marker) or back (no
marker), and the query paths call :func:`recover_ann_for_read` so readers
never serve a mixed store.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dp_search_data_importer_spark.plans.update_index import (
    _delete_dir,
    _swap_dir,
)

_STAGE = "_upsert_stage"
_COMMIT = "_COMMIT.json"
_OLD = "_old_"


def _assigner(path: str, vec_col: str, id_col: str):
    """(part_col, assign_fn, store_cols) from the store's metadata file —
    the frozen quantizers define how a new vector lands in the layout."""
    from dp_search_data_importer_spark.operators import similarity as sim

    qz_path = os.path.join(path, "_quantizers.json")
    planes_path = os.path.join(path, "_planes.json")
    cents_path = os.path.join(path, "_centroids.json")
    if os.path.exists(qz_path):
        with open(qz_path) as f:
            qz = json.load(f)
        cents = np.asarray(qz["centroids"], dtype=np.float64)
        cbs = np.asarray(qz["codebooks"], dtype=np.float64)
        if qz.get("residual"):
            def assign(df):
                return sim.ivfpq_encode(df, cents, cbs, vec_col, id_col)
        else:
            def assign(df):
                assigned = sim.ivf_assign(df, cents, vec_col, id_col)
                coded = sim.pq_encode(assigned, cbs, vec_col, id_col)
                return assigned.select("vec_id", "cell").join(coded, "vec_id")
        return "cell", assign, ["vec_id", "cell", "codes"]
    if os.path.exists(cents_path):
        with open(cents_path) as f:
            cents = np.asarray(json.load(f)["centroids"], dtype=np.float64)

        def assign(df):
            return sim.ivf_assign(df, cents, vec_col, id_col)

        return "cell", assign, ["vec_id", "embedding", "cell"]
    if os.path.exists(planes_path):
        planes = sim.load_ann_planes(path)

        def assign(df):
            return sim.lsh_index(df, planes, vec_col, id_col)

        return "bucket", assign, ["vec_id", "embedding", "bucket"]
    raise ValueError(f"{path} is not a recognized ANN store "
                     "(no _planes/_centroids/_quantizers.json)")


def _apply_commit(path: str, meta: dict) -> None:
    """Roll a fully-staged ANN upsert forward; idempotent rename swaps."""
    stage = os.path.join(path, _STAGE)
    pc = meta["part_col"]
    for p in meta["replace"]:
        _swap_dir(os.path.join(path, f"{pc}={p}"),
                  os.path.join(stage, "store", f"{pc}={p}"),
                  os.path.join(path, f"{_OLD}part_{p}"))
    for p in meta["delete"]:
        _delete_dir(os.path.join(path, f"{pc}={p}"),
                    os.path.join(path, f"{_OLD}part_{p}"))
    marker = os.path.join(stage, _COMMIT)
    if os.path.exists(marker):
        os.remove(marker)
    shutil.rmtree(stage, ignore_errors=True)


def recover_ann_for_read(path: str) -> bool:
    """Read-safe recovery: finish an interrupted commit iff the marker
    exists (same contract as ``update_index.recover_for_read``); a
    marker-less stage may be an upsert still staging and is left alone.
    One ``os.path.exists`` in the common case."""
    marker = os.path.join(path, _STAGE, _COMMIT)
    if not os.path.exists(marker):
        return False
    from dp_search_data_importer_spark.plans.update_index import (
        apply_commit_locked,
    )

    apply_commit_locked(path, marker, lambda meta: _apply_commit(path, meta))
    return True


def recover_ann(path: str) -> str:
    """Writer-side recovery on entry to :func:`upsert_ann`: roll forward
    (marker), else restore any stray backups and discard the stage."""
    if recover_ann_for_read(path):
        return "forward"
    acted = False
    if os.path.exists(path):
        for name in sorted(os.listdir(path)):
            if not name.startswith(_OLD):
                continue
            acted = True
            # backup name _old_part_<v> ↔ live dir <part_col>=<v>; the
            # part col comes from any live sibling dir, else from the
            # store's quantizer metadata (ADVICE r4: when no live
            # partition dir remains, the backup may be the ONLY copy of
            # that partition — restoring needs the metadata fallback,
            # and an undeterminable target must PRESERVE the backup,
            # never delete it)
            v = name[len(_OLD) + len("part_"):]
            pc = next((d.split("=", 1)[0] for d in os.listdir(path)
                       if "=" in d), None)
            if pc is None:
                if os.path.exists(os.path.join(path, "_quantizers.json")) \
                        or os.path.exists(os.path.join(path,
                                                       "_centroids.json")):
                    pc = "cell"
                elif os.path.exists(os.path.join(path, "_planes.json")):
                    pc = "bucket"
            backup = os.path.join(path, name)
            if pc is None:
                raise RuntimeError(
                    f"ANN store {path}: backup {name} present but the "
                    "partition column is undeterminable (no live "
                    "partition dir, no quantizer metadata) — refusing "
                    "to delete what may be the only copy")
            live = os.path.join(path, f"{pc}={v}")
            if not os.path.exists(live):
                os.rename(backup, live)
            else:
                shutil.rmtree(backup)
    stage = os.path.join(path, _STAGE)
    if os.path.exists(stage):
        shutil.rmtree(stage)
        return "back"
    return "back" if acted else "clean"


def upsert_ann(spark: SparkSession, path: str, new_vecs: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id") -> dict:
    """Apply a batch of new/changed vectors to the ANN store at ``path``.

    Keyed last-writer-wins on ``vec_id`` (duplicates within the batch
    collapse); the frozen quantizers assign/encode the batch, both the
    old and new partitions of every touched key rewrite, and the whole
    multi-dir change commits atomically (see module docstring). Returns
    accounting: {received, upserted, replaced, added, affected_parts,
    fraction_new}."""
    recover_ann(path)
    part_col, assign, store_cols = _assigner(path, vec_col, id_col)

    received = new_vecs.count()
    batch = new_vecs.dropDuplicates([id_col])

    stage = os.path.join(path, _STAGE)
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)
    try:
        # stage the assigned batch once (several consumers below)
        assigned = assign(batch).select(*store_cols)
        batch_tmp = os.path.join(stage, "batch")
        assigned.write.mode("overwrite").parquet(batch_tmp)
        assigned = spark.read.parquet(batch_tmp)
        n_new = assigned.count()
        new_ids = assigned.select("vec_id")

        store = spark.read.parquet(path)
        n_store = store.count()
        # moved keys: a replaced vector may land in a different part —
        # column-pruned (vec_id, part) scan locates the old homes
        old_hit = store.join(F.broadcast(new_ids), "vec_id", "left_semi")
        old_parts = {r[part_col] for r in
                     old_hit.select(part_col).distinct().collect()}
        n_replaced = old_hit.count()
        new_parts = {r[part_col] for r in
                     assigned.select(part_col).distinct().collect()}
        affected = sorted(old_parts | new_parts)
        if not affected:
            return {"received": int(received), "upserted": 0, "replaced": 0,
                    "added": 0, "affected_parts": [], "fraction_new": 0.0}

        kept = (store.filter(F.col(part_col).isin(affected))
                .join(new_ids, "vec_id", "left_anti").select(*store_cols))
        merged = kept.unionByName(assigned)
        staged_store = os.path.join(stage, "store")
        (merged.repartition(len(affected), part_col)
         .write.mode("overwrite").partitionBy(part_col)
         .parquet(staged_store))
        staged_parts = {
            d.split("=", 1)[1] for d in os.listdir(staged_store)
            if d.startswith(f"{part_col}=")
        }
        affected_strs = [str(p) for p in affected]
        meta = {
            "part_col": part_col,
            "replace": sorted(staged_parts),
            "delete": sorted(set(affected_strs) - staged_parts),
        }
        with open(os.path.join(stage, _COMMIT), "w") as f:
            json.dump(meta, f)
        from dp_search_data_importer_spark.plans.update_index import (
            apply_commit_locked,
        )

        # contend under the same lock as self-healing readers
        apply_commit_locked(path, os.path.join(stage, _COMMIT),
                            lambda m: _apply_commit(path, m))
        denom = n_store + max(n_new - n_replaced, 0)
        return {"received": int(received), "upserted": int(n_new),
                "replaced": int(n_replaced),
                "added": int(n_new - n_replaced),
                "affected_parts": affected,
                "fraction_new": float(n_new / denom) if denom else 1.0}
    finally:
        if not os.path.exists(os.path.join(stage, _COMMIT)):
            shutil.rmtree(stage, ignore_errors=True)
