"""Reference-parity ingest projection + bulk-body serialization (A5-A7).

Mirrors the reference's semantics exactly, as a pure Catalyst projection:

- field map + rename ``data_type`` → ``type``
  (``/root/reference/transform/transform.go:21-57``; json tag
  ``models/elastic.go:5``)
- ``uid`` is the document key (becomes the ES ``_id``,
  ``handler/handler.go:146``) and ``trace_id`` is dropped — neither appears
  in the document body (``models/elastic.go`` has no counterparts)
- ``population_type`` is ALWAYS materialized, even when all-empty
  (``transform/transform.go:44-49`` unconditionally builds the pointer)
- array-of-struct casts are shape-identical copies
  (``transform/transform.go:50-55``) — no-ops for Spark
- the non-empty-key filter (``handler/handler.go:80-83``) drops rows with
  empty ``uid`` before transformation
- ``to_bulk_ndjson`` rebuilds the byte-exact NDJSON bulk-upsert entry the
  reference POSTs to ``/ons/_bulk`` (``handler/handler.go:133-155``):
  the action line ``{ "update": { "_id": "x" } }`` with Go's literal
  spacing, the doc line ``{"doc":…,"doc_as_upsert": true}`` with
  json.Marshal's struct-declaration field order, HTML escaping of
  ``< > &`` (``\\u003c`` …) and the five ``omitempty`` fields elided
  (release_date, date_changes, provisional_date, language, survey —
  ``models/elastic.go:14-24``). Byte- and parsed-golden-tested against the
  reference's component-test body (``features/import-search-data.feature``).
  One deliberate divergence: Go marshals a *nil* keywords/topics slice as
  ``null`` while this path emits ``[]`` — unreachable in practice, because
  the Avro schema's arrays always decode to non-nil slices; ``dimensions``
  keeps Go's append-to-nil semantics (empty → ``null``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SDI_EVENT_SCHEMA = T.StructType([
    T.StructField("uid", T.StringType()),
    T.StructField("uri", T.StringType()),
    T.StructField("edition", T.StringType()),
    T.StructField("data_type", T.StringType()),
    T.StructField("job_id", T.StringType()),
    T.StructField("search_index", T.StringType()),
    T.StructField("cdid", T.StringType()),
    T.StructField("dataset_id", T.StringType()),
    T.StructField("keywords", T.ArrayType(T.StringType())),
    T.StructField("meta_description", T.StringType()),
    T.StructField("release_date", T.StringType()),
    T.StructField("summary", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("topics", T.ArrayType(T.StringType())),
    T.StructField("trace_id", T.StringType()),
    T.StructField("date_changes", T.ArrayType(T.StructType([
        T.StructField("change_notice", T.StringType()),
        T.StructField("previous_date", T.StringType()),
    ]))),
    T.StructField("cancelled", T.BooleanType()),
    T.StructField("finalised", T.BooleanType()),
    T.StructField("provisional_date", T.StringType()),
    T.StructField("published", T.BooleanType()),
    T.StructField("canonical_topic", T.StringType()),
    T.StructField("dimensions", T.ArrayType(T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("agg_key", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("raw_label", T.StringType()),
    ]))),
    T.StructField("population_type", T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("agg_key", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("label", T.StringType()),
    ])),
    T.StructField("language", T.StringType()),
    T.StructField("survey", T.StringType()),
])

_S = lambda c: F.coalesce(F.col(c), F.lit(""))
_B = lambda c: F.coalesce(F.col(c), F.lit(False))
_A = lambda c: F.coalesce(F.col(c), F.array().cast("array<string>"))


def filter_valid_events(events: DataFrame) -> DataFrame:
    """A4: drop events with empty uid — 'no uid … no transformation possible'
    (handler/handler.go:80-83). Silently skipped, as in the reference."""
    return events.filter(F.col("uid").isNotNull() & (F.col("uid") != ""))


def transform_events(events: DataFrame) -> DataFrame:
    """SearchDataImport → (uid key, EsModel-shaped doc struct)."""
    pt = F.col("population_type")
    doc = F.struct(
        _S("data_type").alias("type"),
        _S("uri").alias("uri"),
        _S("job_id").alias("job_id"),
        _S("search_index").alias("search_index"),
        _S("cdid").alias("cdid"),
        _S("dataset_id").alias("dataset_id"),
        _S("edition").alias("edition"),
        _A("keywords").alias("keywords"),
        _S("meta_description").alias("meta_description"),
        _S("release_date").alias("release_date"),
        _S("summary").alias("summary"),
        _S("title").alias("title"),
        _A("topics").alias("topics"),
        F.col("date_changes").alias("date_changes"),
        _B("cancelled").alias("cancelled"),
        _B("finalised").alias("finalised"),
        _S("provisional_date").alias("provisional_date"),
        _B("published").alias("published"),
        _S("language").alias("language"),
        _S("survey").alias("survey"),
        _S("canonical_topic").alias("canonical_topic"),
        # always materialized, zero-valued fields included
        F.struct(
            F.coalesce(pt["key"], F.lit("")).alias("key"),
            F.coalesce(pt["agg_key"], F.lit("")).alias("agg_key"),
            F.coalesce(pt["name"], F.lit("")).alias("name"),
            F.coalesce(pt["label"], F.lit("")).alias("label"),
        ).alias("population_type"),
        F.col("dimensions").alias("dimensions"),
    )
    return filter_valid_events(events).select(F.col("uid"), doc.alias("doc"))


def to_bulk_ndjson(transformed: DataFrame) -> DataFrame:
    """(uid, doc) → the two NDJSON bulk lines (handler/handler.go:133-155).

    Field ORDER follows the Go struct (json.Marshal emits declaration order,
    models/elastic.go:4-28); the five omitempty fields are elided when
    zero-valued. Built with to_json on a reordered struct + regex surgery for
    the omitempty semantics — all Catalyst, golden-byte-tested.
    """
    d = F.col("doc")
    parts: list[Column] = []

    def raw(name: str, value: Column) -> Column:
        # JSON-encode a single field as '"name":<json>' using a 1-field struct
        j = F.to_json(F.struct(value.alias(name)))
        return j.substr(F.lit(2), F.length(j) - F.lit(2))  # strip { }

    def always(name: str, src: Column) -> None:
        parts.append(raw(name, src))

    def omitempty(name: str, src: Column, empty_check: Column) -> None:
        parts.append(F.when(empty_check, F.lit(None)).otherwise(raw(name, src)))

    always("type", d["type"])
    always("uri", d["uri"])
    always("job_id", d["job_id"])
    always("search_index", d["search_index"])
    always("cdid", d["cdid"])
    always("dataset_id", d["dataset_id"])
    always("edition", d["edition"])
    always("keywords", d["keywords"])
    always("meta_description", d["meta_description"])
    omitempty("release_date", d["release_date"], d["release_date"] == "")
    always("summary", d["summary"])
    always("title", d["title"])
    always("topics", d["topics"])
    omitempty("date_changes", d["date_changes"],
              d["date_changes"].isNull() | (F.size(d["date_changes"]) == 0))
    always("cancelled", d["cancelled"])
    always("finalised", d["finalised"])
    omitempty("provisional_date", d["provisional_date"], d["provisional_date"] == "")
    always("published", d["published"])
    omitempty("language", d["language"], d["language"] == "")
    omitempty("survey", d["survey"], d["survey"] == "")
    always("canonical_topic", d["canonical_topic"])
    always("population_type", d["population_type"])
    parts.append(F.when(
        d["dimensions"].isNull() | (F.size(d["dimensions"]) == 0),
        F.lit('"dimensions":null'),
    ).otherwise(raw("dimensions", d["dimensions"])))

    doc_json = F.concat(
        F.lit('{"doc":{'),
        F.concat_ws(",", *parts),
        # Go: ... + `,"doc_as_upsert": true}` — space after the colon
        # (handler.go:150)
        F.lit('},"doc_as_upsert": true}'),
    )
    # Go json.Marshal HTML-escapes <, >, & inside strings (SetEscapeHTML
    # default); to_json does not — apply the same escapes to the whole doc
    # line (outside strings those bytes cannot occur in valid JSON)
    for ch, esc in (("&", "\\\\u0026"), ("<", "\\\\u003c"), (">", "\\\\u003e")):
        doc_json = F.regexp_replace(doc_json, ch, esc)
    # action line bytes per handler.go:146: `{ "update": { "_id": "x" } }`
    # (spaces included; the uid is concatenated raw, exactly like Go)
    action = F.concat(F.lit('{ "update": { "_id": "'), F.col("uid"),
                      F.lit('" } }'))
    return transformed.select(
        F.col("uid"),
        action.alias("action_line"),
        doc_json.alias("doc_line"),
    )
