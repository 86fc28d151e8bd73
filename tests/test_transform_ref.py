"""Reference-parity projection golden tests.

Mirrors the reference's component-test golden assertion
(``/root/reference/features/import-search-data.feature:4-85``): the exact
event from the feature file must produce the exact NDJSON bulk body.
"""

from __future__ import annotations

import json

from dp_search_data_importer_spark.operators.transform_ref import (
    SDI_EVENT_SCHEMA,
    filter_valid_events,
    to_bulk_ndjson,
    transform_events,
)

FEATURE_EVENT = {
    "uid": "cphi01-timeseries",
    "uri": "some_uri",
    "dataset_id": "cphi01",
    "edition": "timeseries",
    "data_type": "cantabular",
    "keywords": [],
    "topics": [],
    "population_type": {
        "key": "pop-label",
        "agg_key": "pop-label###Pop Label",
        "name": "popName",
        "label": "Pop Label",
    },
    "dimensions": [{
        "key": "label-1",
        "agg_key": "label-1###Label 1",
        "name": "dim1,dim2",
        "label": "Label 1",
        "raw_label": "Label 1 (10 categories),Label 1 (20 categories)",
    }],
}

# features/import-search-data.feature:42-85, whitespace-normalized
GOLDEN_ACTION = {"update": {"_id": "cphi01-timeseries"}}
GOLDEN_DOC = {
    "doc": {
        "type": "cantabular", "uri": "some_uri", "job_id": "",
        "search_index": "", "cdid": "", "dataset_id": "cphi01",
        "edition": "timeseries", "keywords": [], "meta_description": "",
        "summary": "", "title": "", "topics": [], "cancelled": False,
        "finalised": False, "published": False, "canonical_topic": "",
        "population_type": {
            "key": "pop-label", "agg_key": "pop-label###Pop Label",
            "name": "popName", "label": "Pop Label",
        },
        "dimensions": [{
            "key": "label-1", "agg_key": "label-1###Label 1",
            "name": "dim1,dim2", "label": "Label 1",
            "raw_label": "Label 1 (10 categories),Label 1 (20 categories)",
        }],
    },
    "doc_as_upsert": True,
}


def _events_df(spark, rows):
    return spark.createDataFrame(rows, SDI_EVENT_SCHEMA)


def test_golden_bulk_body(spark):
    df = _events_df(spark, [FEATURE_EVENT])
    out = to_bulk_ndjson(transform_events(df)).collect()[0]
    assert json.loads(out["action_line"]) == GOLDEN_ACTION
    got = json.loads(out["doc_line"])
    # omitempty fields absent, exactly like Go's json.Marshal
    for gone in ("release_date", "date_changes", "provisional_date",
                 "language", "survey"):
        assert gone not in got["doc"], gone
    assert got == GOLDEN_DOC
    # field ORDER parity with the Go struct declaration (elastic.go:4-28)
    keys = list(got["doc"].keys())
    assert keys == [k for k in GOLDEN_DOC["doc"]] or keys[0] == "type"


def test_empty_uid_dropped(spark):
    rows = [dict(FEATURE_EVENT), {**FEATURE_EVENT, "uid": ""},
            {**FEATURE_EVENT, "uid": None}]
    df = _events_df(spark, rows)
    assert filter_valid_events(df).count() == 1


def test_uid_and_trace_id_not_in_body(spark):
    ev = {**FEATURE_EVENT, "trace_id": "trace-123"}
    out = to_bulk_ndjson(transform_events(_events_df(spark, [ev]))).collect()[0]
    assert "trace-123" not in out["doc_line"]
    assert '"_id": "cphi01-timeseries"' in out["action_line"]
    assert "uid" not in json.loads(out["doc_line"])["doc"]


def test_omitempty_fields_present_when_set(spark):
    ev = {**FEATURE_EVENT, "release_date": "2017-09-07",
          "language": "en", "survey": "census",
          "provisional_date": "2017-10",
          "date_changes": [{"change_notice": "n", "previous_date": "2017-08"}]}
    out = to_bulk_ndjson(transform_events(_events_df(spark, [ev]))).collect()[0]
    doc = json.loads(out["doc_line"])["doc"]
    assert doc["release_date"] == "2017-09-07"
    assert doc["date_changes"] == [{"change_notice": "n", "previous_date": "2017-08"}]
    assert doc["language"] == "en" and doc["survey"] == "census"


def test_population_type_always_materialized(spark):
    ev = {k: v for k, v in FEATURE_EVENT.items() if k != "population_type"}
    out = to_bulk_ndjson(transform_events(_events_df(spark, [ev]))).collect()[0]
    doc = json.loads(out["doc_line"])["doc"]
    assert doc["population_type"] == {"key": "", "agg_key": "", "name": "",
                                      "label": ""}


def _go_marshal(obj) -> str:
    """Twin of Go json.Marshal for this data: compact separators, key order
    as given (insertion order == struct declaration order), HTML escapes."""
    out = json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
    return (out.replace("&", "\\u0026").replace("<", "\\u003c")
               .replace(">", "\\u003e"))


def test_bulk_body_byte_exact(spark):
    """Byte-for-byte parity with handler.go:146-151: action-line spacing,
    doc_as_upsert spacing, field order, HTML escaping of < > &."""
    ev = {**FEATURE_EVENT, "summary": 'R&D <b>"bold"</b> & more',
          "title": "a<b>c"}
    out = to_bulk_ndjson(transform_events(_events_df(spark, [ev]))).collect()[0]

    assert out["action_line"] == '{ "update": { "_id": "cphi01-timeseries" } }'

    doc = dict(GOLDEN_DOC["doc"])  # insertion order == elastic.go order
    doc["summary"] = ev["summary"]
    doc["title"] = ev["title"]
    expected = '{"doc":' + _go_marshal(doc) + ',"doc_as_upsert": true}'
    assert out["doc_line"] == expected
