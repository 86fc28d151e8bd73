"""Index rollover + alias lifecycle — ES ILM's rollover action, natively.

At 10^12 files nobody runs one ever-growing index: ingest writes to the
NEWEST member of an alias, a size condition rolls writes over to a fresh
member, and searches fan out across all members (ES `_rollover` + index
lifecycle management; the alias is what `handler/handler.go:95` would
target in a production deployment of the reference). Old members become
immutable — which is exactly the property that makes the pattern scale:
incremental maintenance cost is bounded by the WRITE member's size, not
the corpus's, and historical members never re-shuffle.

Layout: ``alias_root/alias.json`` (members list + write index + the
rollover condition) with numbered member index dirs beside it. The state
file is updated via write-temp + ``os.replace`` (atomic on POSIX), and a
member is only appended AFTER its directory holds a complete index
(stats.json last — `build_index`'s own commit order), so a crash at any
point leaves a readable alias: either without the new member (its
partial dir is unreferenced garbage) or with it fully built.

Searches delegate to :func:`plans.multi_index.search_indices`
(query_then_fetch / dfs_query_then_fetch); writes delegate to
:func:`plans.build_index.build_index` (first batch of a member) or
:func:`plans.update_index.upsert_docs` (subsequent batches), so every
crash-safety property of those paths is inherited unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from dp_search_data_importer_spark.checkpoint import read_stats_json
from dp_search_data_importer_spark.config import EngineConfig

_STATE = "alias.json"


def create_alias(alias_root: str, *, max_docs: int = 1_000_000,
                 code_aware: bool = True) -> dict:
    """Initialise an empty alias at ``alias_root``. ``max_docs`` is the
    rollover condition (ES ``conditions.max_docs``): a write batch that
    would land in a member already at/over the limit starts a new member
    instead."""
    os.makedirs(alias_root, exist_ok=True)
    path = os.path.join(alias_root, _STATE)
    if os.path.exists(path):
        raise ValueError(f"alias already exists: {path}")
    state = {"members": [], "write_index": None,
             "max_docs": int(max_docs), "code_aware": bool(code_aware)}
    _write_state(alias_root, state)
    return state


def read_alias(alias_root: str) -> dict:
    with open(os.path.join(alias_root, _STATE)) as f:
        return json.load(f)


def member_dirs(alias_root: str) -> list[str]:
    return [os.path.join(alias_root, m)
            for m in read_alias(alias_root)["members"]]


def _write_state(alias_root: str, state: dict) -> None:
    path = os.path.join(alias_root, _STATE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic: readers see old or new, never partial


def decide_write_member(alias_root: str) -> tuple[str, bool, bool]:
    """The rollover decision, separated from the write so a streaming
    caller can JOURNAL it before applying (see :func:`apply_stream_batch`
    — redelivery must reuse the original decision, or a batch that
    crossed a rollover boundary would duplicate into a fresh member on
    redelivery). Returns (member, rolled_over, is_new_member)."""
    state = read_alias(alias_root)
    write = state["write_index"]
    rolled = False
    if write is not None:
        n = read_stats_json(os.path.join(alias_root, write))["n_docs"]
        if n >= state["max_docs"]:
            write = None
            rolled = True
    if write is None:
        return f"{len(state['members']) + 1:06d}", rolled, True
    return write, False, False


def write_batch(spark: SparkSession, alias_root: str, docs: DataFrame,
                cfg: EngineConfig | None = None, *,
                member: str | None = None) -> dict:
    """Ingest a batch through the alias: upsert into the write member,
    rolling over to a fresh member first when the write member is at/over
    ``max_docs`` (the ES rollover-on-write contract: the condition is
    evaluated BEFORE the write, so a member can exceed the limit by at
    most one batch — exactly ES's behavior with bulk requests).

    Returns {member, rolled_over, accounting}. ``member`` forces the
    target (a streaming redelivery replaying its journaled decision);
    default is :func:`decide_write_member`. Note: a doc_id already
    ingested into an OLDER member is NOT deduplicated here — as in ES,
    rollover-based ingest assumes append-style corpora (each doc arrives
    once) or id-partitioned routing; cross-member upserts would need a
    delete in the old member (``update_index.delete_docs``)."""
    from dp_search_data_importer_spark.plans.build_index import build_index
    from dp_search_data_importer_spark.plans.update_index import upsert_docs

    cfg = cfg or EngineConfig()
    state = read_alias(alias_root)
    if member is None:
        write, rolled, is_new = decide_write_member(alias_root)
    else:
        write, rolled = member, False
        # a forced member is "new" unless it already completed a build —
        # a crash after build_index but before the state append re-runs
        # the fresh build idempotently (resume=False overwrites)
        is_new = write not in state["members"]
    if is_new:
        d = os.path.join(alias_root, write)
        build_index(spark, docs, d, cfg, code_aware=state["code_aware"],
                    waves=1, resume=False)
        # append only after the member is fully built (stats.json exists)
        if write not in state["members"]:
            state["members"] = state["members"] + [write]
        state["write_index"] = write
        _write_state(alias_root, state)
        acc = {"received": read_stats_json(d)["n_docs"]}
    else:
        acc = upsert_docs(spark, os.path.join(alias_root, write), docs)
    return {"member": write, "rolled_over": rolled, "accounting": acc}


def _journal(alias_root: str, name: str) -> str:
    return os.path.join(alias_root, name)


def _read_jsonl(path: str) -> list[dict]:
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def apply_stream_batch(spark: SparkSession, alias_root: str,
                       docs: DataFrame, batch_id: int,
                       cfg: EngineConfig | None = None) -> dict | None:
    """Exactly-once micro-batch application for :func:`run_alias_stream`.

    Redelivery protocol (the rollover decision is NOT idempotent by
    itself: a redelivered batch that originally crossed the rollover
    boundary would open ANOTHER fresh member and duplicate its docs):

    1. an already-APPLIED batch_id is a no-op;
    2. the (batch_id → member) decision is journaled to
       ``_batch_intents.jsonl`` BEFORE any write — redelivery replays the
       journaled member, where application is idempotent (keyed upsert,
       or a fresh overwrite build for a member's bootstrap batch);
    3. ``_applied_batches.jsonl`` records completion LAST.

    A crash between any two steps re-runs from the journaled decision and
    converges to the same alias state (property-tested)."""
    if docs.isEmpty():
        return None
    applied = {int(r["batch_id"])
               for r in _read_jsonl(_journal(alias_root,
                                             "_applied_batches.jsonl"))}
    if int(batch_id) in applied:
        return None
    intents = {int(r["batch_id"]): r["member"]
               for r in _read_jsonl(_journal(alias_root,
                                             "_batch_intents.jsonl"))}
    member = intents.get(int(batch_id))
    if member is None:
        member, _, _ = decide_write_member(alias_root)
        with open(_journal(alias_root, "_batch_intents.jsonl"), "a") as f:
            f.write(json.dumps({"batch_id": int(batch_id),
                                "member": member}) + "\n")
    res = write_batch(spark, alias_root, docs, cfg, member=member)
    with open(_journal(alias_root, "_applied_batches.jsonl"), "a") as f:
        f.write(json.dumps({"batch_id": int(batch_id),
                            "member": member}) + "\n")
    return res


def run_alias_stream(docs_stream: DataFrame, alias_root: str,
                     checkpoint_dir: str, *,
                     cfg: EngineConfig | None = None,
                     available_now: bool = True,
                     processing_time: str = "5 seconds"):
    """Continuous ingest THROUGH the alias — the production shape of the
    reference's forever-stream at 10^12 files: micro-batches land in the
    rollover write member, size conditions cut new members, searches fan
    out over the whole alias, and historical members stay immutable.
    foreachBatch + checkpointLocation give at-least-once delivery;
    :func:`apply_stream_batch`'s intent journal upgrades it to
    effectively-once across rollover boundaries."""
    def _handle(df: DataFrame, batch_id: int) -> None:
        apply_stream_batch(df.sparkSession, alias_root, df, batch_id, cfg)

    writer = (docs_stream.writeStream
              .foreachBatch(_handle)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def search_alias(spark: SparkSession, alias_root: str, queries: DataFrame,
                 cfg: EngineConfig | None = None, k: int | None = None,
                 mode: str = "dfs_query_then_fetch") -> DataFrame:
    """Top-k across every alias member. Default mode is dfs (merged
    global statistics): members created by time-based rollover have
    correlated-but-drifting df distributions, and dfs scoring is exactly
    the single-merged-index ranking (property-tested in
    ``test_multi_index``), which is what a user who never heard of
    rollover expects."""
    from dp_search_data_importer_spark.plans.multi_index import (
        search_indices,
    )

    dirs = member_dirs(alias_root)
    if not dirs:
        raise ValueError(f"alias has no members yet: {alias_root}")
    return search_indices(spark, dirs, queries, cfg, k=k, mode=mode)
