"""Streaming ingestion twin: idempotent upsert (effectively-once), windowed
rollup — mirrors the reference's at-least-once + doc_as_upsert contract."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dp_search_data_importer_spark.streaming.ingest_stream import (
    run_ingest_stream,
    upsert_batch,
    windowed_event_counts,
)

EVENT_SCHEMA = "uid string, title string, seq long"


def _store_contents(spark, store_dir):
    df = spark.read.parquet(store_dir).select("uid", "title", "seq")
    return {tuple(r) for r in df.collect()}


def test_upsert_batch_idempotent_and_last_writer_wins(spark, tmp_path):
    store = str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [("a", "A1", 1), ("b", "B1", 1)], EVENT_SCHEMA
    )
    upsert_batch(b1, store)
    assert _store_contents(spark, store) == {("a", "A1", 1), ("b", "B1", 1)}

    # update a, insert c; duplicate uid within batch → highest seq wins
    b2 = spark.createDataFrame(
        [("a", "A2", 2), ("c", "C1", 1), ("a", "A3", 3)], EVENT_SCHEMA
    )
    upsert_batch(b2, store)
    expected = {("a", "A3", 3), ("b", "B1", 1), ("c", "C1", 1)}
    assert _store_contents(spark, store) == expected

    # REDELIVERY of b2 (at-least-once) → identical store (idempotent)
    upsert_batch(b2, store)
    assert _store_contents(spark, store) == expected


def test_streaming_ingest_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [{"uid": f"doc{i}", "title": f"T{i}", "seq": 1} for i in range(20)]
    with open(src / "part1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    events = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    q = run_ingest_stream(events, store, ckpt, available_now=True)
    q.awaitTermination(120)
    assert spark.read.parquet(store).count() == 20

    # second file arrives; restart drains only the new data (checkpointed)
    with open(src / "part2.json", "w") as f:
        f.write(json.dumps({"uid": "doc0", "title": "T0-v2", "seq": 2}) + "\n")
        f.write(json.dumps({"uid": "new", "title": "N", "seq": 1}) + "\n")
    q2 = run_ingest_stream(
        spark.readStream.schema(EVENT_SCHEMA).json(str(src)), store, ckpt,
        available_now=True,
    )
    q2.awaitTermination(120)
    got = _store_contents(spark, store)
    assert ("doc0", "T0-v2", 2) in got and ("new", "N", 1) in got
    assert len(got) == 21


def test_windowed_counts_batch_twin(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = windowed_event_counts(ev, window_dur="1 hour")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert all(r["win_end"] > r["win_start"] for r in rows)
