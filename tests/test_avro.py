"""Avro encode→decode→transform round-trip (A1/A3 parity).

Mirrors the reference's own round-trip unit test
(``/root/reference/handler/handler_test.go:144-154``: marshal the expected
event with the schema, feed the bytes through the handler). No broker is
needed — the decode path runs on literal bytes, exactly like the reference
test.
"""

from __future__ import annotations

from dp_search_data_importer_spark.operators.transform_ref import (
    SDI_EVENT_SCHEMA,
    transform_events,
)
from dp_search_data_importer_spark.sources.avro_events import (
    AVRO_WIRE_FIELDS,
    decode_avro_events,
    decode_event,
    encode_event,
)
from tests.test_transform_ref import FEATURE_EVENT, GOLDEN_DOC

FULL_EVENT = {
    "uid": "uid-1", "uri": "/economy/prices", "data_type": "release",
    "job_id": "job-9", "search_index": "ons", "cdid": "ABC1",
    "dataset_id": "ds-7", "edition": "march-2021",
    "keywords": ["inflation", "cpi"],
    "meta_description": "desc", "release_date": "2021-03-01T00:00:00Z",
    "summary": "sum", "title": "CPI release", "topics": ["t1", "t2"],
    "trace_id": "trace-42", "cancelled": False, "finalised": True,
    "published": True, "language": "en", "survey": "cpi-survey",
    "canonical_topic": "economy",
    "date_changes": [{"change_notice": "moved", "previous_date": "2021-02-01"}],
    "provisional_date": "2021-03",
    "dimensions": [{"key": "k", "agg_key": "k###K", "name": "n",
                    "label": "L", "raw_label": "RL"}],
    "population_type": {"key": "pk", "agg_key": "pk###PK", "name": "pn",
                        "label": "PL"},
}


def _normalize(ev: dict) -> dict:
    """Fill schema defaults the way the Avro codec does (missing string →
    '', bool → False, array → [], record → zero-valued)."""
    out = {}
    for name, typ in AVRO_WIRE_FIELDS:
        v = ev.get(name)
        if typ == "string":
            out[name] = v or ""
        elif typ == "boolean":
            out[name] = bool(v)
        elif isinstance(typ, tuple) and typ[0] == "array":
            items = v or []
            if isinstance(typ[1], tuple):  # array<record>
                items = [
                    {fn: (item.get(fn) or "") for fn, _ in typ[1][1]}
                    for item in items
                ]
            out[name] = items
        else:  # record
            out[name] = {fn: ((v or {}).get(fn) or "") for fn, _ in typ[1]}
    return out


def test_binary_roundtrip_full_event():
    assert decode_event(encode_event(FULL_EVENT)) == _normalize(FULL_EVENT)


def test_binary_roundtrip_defaults():
    """An almost-empty event round-trips to the schema's zero values."""
    got = decode_event(encode_event({"uid": "only-uid"}))
    assert got["uid"] == "only-uid"
    assert got["keywords"] == [] and got["topics"] == []
    assert got["cancelled"] is False
    assert got["population_type"] == {"key": "", "agg_key": "",
                                      "name": "", "label": ""}


def test_spark_decode_then_transform_matches_golden(spark):
    """encode(feature event) → Spark python-engine decode →
    transform_events ≡ feeding the event in directly (the A5 golden)."""
    import json

    from dp_search_data_importer_spark.operators.transform_ref import (
        to_bulk_ndjson,
    )

    raw = [(encode_event(FEATURE_EVENT),), (encode_event(FULL_EVENT),)]
    df = spark.createDataFrame(raw, "value binary")
    events = decode_avro_events(df, "value", engine="python")
    assert [f.name for f in events.schema] == [f.name for f in SDI_EVENT_SCHEMA]

    out = {r["uid"]: r for r in to_bulk_ndjson(transform_events(events)).collect()}
    got = json.loads(out["cphi01-timeseries"]["doc_line"])
    assert got == GOLDEN_DOC

    full = json.loads(out["uid-1"]["doc_line"])["doc"]
    assert full["release_date"] == FULL_EVENT["release_date"]
    assert full["date_changes"] == FULL_EVENT["date_changes"]
    assert full["survey"] == FULL_EVENT["survey"]
    # trace_id dropped from the body, uid not duplicated into it (A5)
    assert "trace_id" not in full and "uid" not in full


def test_spark_decode_streaming_frame(spark, tmp_path):
    """The python decoder composes with readStream (the no-broker twin of
    read_kafka_stream: file source in, same decode + transform)."""
    import os

    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(encode_event(FULL_EVENT),)], "value binary"
    ).write.parquet(src)
    stream = spark.readStream.schema("value binary").parquet(src)
    decoded = decode_avro_events(stream, "value", engine="python")
    assert decoded.isStreaming
    out_dir = str(tmp_path / "out")
    q = (transform_events(decoded).writeStream.format("parquet")
         .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
         .option("path", os.path.join(out_dir, "data"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(os.path.join(out_dir, "data")).collect()
    assert len(rows) == 1 and rows[0]["uid"] == "uid-1"


def test_jvm_engine_if_available(spark):
    """from_avro path — exercised only when the spark-avro module is on the
    classpath (real clusters); cleanly skipped here otherwise."""
    import pytest

    df = spark.createDataFrame([(encode_event(FULL_EVENT),)], "value binary")
    try:
        rows = decode_avro_events(df, "value", engine="jvm").collect()
    except Exception as e:  # noqa: BLE001 - AnalysisException w/o the module
        pytest.skip(f"spark-avro module unavailable: {type(e).__name__}")
    assert rows[0]["uid"] == "uid-1"
