"""Kafka + Avro ingestion path (SURVEY.md §2 A1/A3).

The reference consumes ``search-data-import`` events as Avro-encoded Kafka
messages (``/root/reference/service/initialise.go:41-66``; schema
``/root/reference/schema/schema.go:7-61``; the unit test round-trips a real
Avro encode→decode, ``handler/handler_test.go:144-154``). This module is the
Spark twin:

- ``SDI_AVRO_SCHEMA_JSON`` — the Avro schema, field-for-field identical to
  schema.go (Avro binary is field-ORDER-sensitive; the order here is the
  wire order, which differs from the columnar ``SDI_EVENT_SCHEMA``).
- ``read_kafka_stream`` — the production source line:
  ``readStream.format("kafka")`` + per-trigger offset cap (the reference's
  500-docs/5-s micro-batch) + Avro decode.
- ``decode_avro_events`` — two engines: ``jvm`` uses ``from_avro`` (needs
  the external spark-avro package on the classpath — present on a real
  cluster, absent in this sandbox); ``python`` is a dependency-free
  Arrow-batched binary decoder implementing the Avro 1.x binary spec
  (zigzag varints + utf8 + array blocks) for exactly this schema. Both
  yield ``SDI_EVENT_SCHEMA``-shaped rows, so the downstream
  ``transform_events`` path is engine-agnostic.
- ``encode_event`` — the test-producer twin (A12): pure-Python Avro binary
  encoder used by the round-trip tests (the reference's producer does the
  same encode before publishing, ``cmd/producer/main.go``).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from dp_search_data_importer_spark.operators.transform_ref import SDI_EVENT_SCHEMA

SDI_AVRO_SCHEMA_JSON = """{
  "type": "record",
  "name": "search-data-import",
  "fields": [
    {"name": "uid", "type": "string", "default": ""},
    {"name": "uri", "type": "string", "default": ""},
    {"name": "data_type", "type": "string", "default": ""},
    {"name": "job_id", "type": "string", "default": ""},
    {"name": "search_index", "type": "string", "default": ""},
    {"name": "cdid", "type": "string", "default": ""},
    {"name": "dataset_id", "type": "string", "default": ""},
    {"name": "edition", "type": "string", "default": ""},
    {"name": "keywords", "type": {"type":"array","items":"string"}},
    {"name": "meta_description", "type": "string", "default": ""},
    {"name": "release_date", "type": "string", "default": ""},
    {"name": "summary", "type": "string", "default": ""},
    {"name": "title", "type": "string", "default": ""},
    {"name": "topics", "type": {"type":"array","items":"string"}},
    {"name": "trace_id", "type": "string", "default": ""},
    {"name": "cancelled", "type": "boolean", "default": false},
    {"name": "finalised", "type": "boolean", "default": false},
    {"name": "published", "type": "boolean", "default": false},
    {"name": "language", "type": "string", "default": ""},
    {"name": "survey", "type": "string", "default": ""},
    {"name": "canonical_topic", "type": "string", "default": ""},
    {"name": "date_changes", "type": {"type":"array","items":{
      "name": "ReleaseDateDetails",
      "type" : "record",
      "fields" : [
        {"name": "change_notice", "type": "string", "default": ""},
        {"name": "previous_date", "type": "string", "default": ""}
      ]
    }}},
    {"name": "provisional_date", "type": "string", "default": ""},
    {"name": "dimensions", "type": {"type": "array", "items": {
      "name": "Dimension",
      "type" : "record",
      "fields": [
        { "name": "key", "type": "string", "default": "" },
        { "name": "agg_key", "type": "string", "default": "" },
        { "name": "name", "type": "string", "default": "" },
        { "name": "label", "type": "string", "default": "" },
        { "name": "raw_label", "type": "string", "default": "" }
      ]
    }}},
    {"name": "population_type", "type": {
      "name": "PopulationType", "type": "record", "fields": [
        { "name": "key", "type": "string", "default": "" },
        { "name": "agg_key", "type": "string", "default": "" },
        { "name": "name", "type": "string", "default": ""},
        { "name": "label", "type": "string", "default": ""}
      ]
    }}
  ]
}"""

# wire-order field plan driving the pure-Python codec (types: "string",
# "boolean", ("array", item), ("record", [(name, type), ...]))
_DATE_CHANGES_REC = ("record", [("change_notice", "string"),
                                ("previous_date", "string")])
_DIMENSION_REC = ("record", [("key", "string"), ("agg_key", "string"),
                             ("name", "string"), ("label", "string"),
                             ("raw_label", "string")])
_POPULATION_REC = ("record", [("key", "string"), ("agg_key", "string"),
                              ("name", "string"), ("label", "string")])

AVRO_WIRE_FIELDS: list[tuple[str, object]] = [
    ("uid", "string"), ("uri", "string"), ("data_type", "string"),
    ("job_id", "string"), ("search_index", "string"), ("cdid", "string"),
    ("dataset_id", "string"), ("edition", "string"),
    ("keywords", ("array", "string")), ("meta_description", "string"),
    ("release_date", "string"), ("summary", "string"), ("title", "string"),
    ("topics", ("array", "string")), ("trace_id", "string"),
    ("cancelled", "boolean"), ("finalised", "boolean"),
    ("published", "boolean"), ("language", "string"), ("survey", "string"),
    ("canonical_topic", "string"),
    ("date_changes", ("array", _DATE_CHANGES_REC)),
    ("provisional_date", "string"),
    ("dimensions", ("array", _DIMENSION_REC)),
    ("population_type", _POPULATION_REC),
]


# --- Avro binary primitives (Avro 1.x spec: zigzag varint longs) -----------

def _write_long(buf: io.BytesIO, n: int) -> None:
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_value(buf: io.BytesIO, typ, v) -> None:
    if typ == "string":
        raw = (v or "").encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif isinstance(typ, tuple) and typ[0] == "array":
        items = v or []
        if items:
            _write_long(buf, len(items))
            for item in items:
                _write_value(buf, typ[1], item)
        _write_long(buf, 0)
    elif isinstance(typ, tuple) and typ[0] == "record":
        v = v or {}
        for name, ftyp in typ[1]:
            _write_value(buf, ftyp, v.get(name))
    else:  # pragma: no cover
        raise TypeError(f"unsupported avro type {typ!r}")


def _read_value(buf: io.BytesIO, typ):
    if typ == "string":
        n = _read_long(buf)
        return buf.read(n).decode("utf-8")
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if isinstance(typ, tuple) and typ[0] == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec-allowed)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_read_value(buf, typ[1]))
    if isinstance(typ, tuple) and typ[0] == "record":
        return {name: _read_value(buf, ftyp) for name, ftyp in typ[1]}
    raise TypeError(f"unsupported avro type {typ!r}")  # pragma: no cover


def encode_event(event: dict) -> bytes:
    """SearchDataImport dict → Avro binary (the test producer twin)."""
    buf = io.BytesIO()
    for name, typ in AVRO_WIRE_FIELDS:
        _write_value(buf, typ, event.get(name))
    return buf.getvalue()


def decode_event(raw: bytes) -> dict:
    """Avro binary → SearchDataImport dict (wire-order fields)."""
    buf = io.BytesIO(raw)
    return {name: _read_value(buf, typ) for name, typ in AVRO_WIRE_FIELDS}


# --- Spark decode ----------------------------------------------------------

def decode_avro_events(df: DataFrame, value_col: str = "value",
                       engine: str = "python") -> DataFrame:
    """binary Avro payloads → SDI_EVENT_SCHEMA rows.

    ``engine="jvm"`` uses ``from_avro`` (requires the external spark-avro
    package, standard on a real cluster); ``engine="python"`` is the
    dependency-free Arrow-batched decoder — same output schema, so the
    downstream transform is identical. Works on batch AND streaming frames.
    """
    if engine == "jvm":
        from pyspark.sql.avro.functions import from_avro

        import pyspark.sql.functions as F

        decoded = df.select(
            from_avro(F.col(value_col), SDI_AVRO_SCHEMA_JSON).alias("e")
        )
        return decoded.select(*[
            decoded["e"][f.name].alias(f.name) for f in SDI_EVENT_SCHEMA
        ])

    import pandas as pd

    cols = [f.name for f in SDI_EVENT_SCHEMA]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_event(bytes(b)) for b in pdf[value_col]]
            yield pd.DataFrame(
                {c: [r[c] for r in rows] for c in cols}
            )

    return df.select(value_col).mapInPandas(gen, schema=SDI_EVENT_SCHEMA)


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "search-data-import",
    batch_size: int = 500,
    n_partitions: int = 1,
    starting_offsets: str = "earliest",
    engine: str = "jvm",
) -> DataFrame:
    """The reference's entry point as a Structured Streaming source (A1):
    ``KAFKA_OFFSET=oldest`` → ``startingOffsets=earliest``; the 500-docs/5-s
    micro-batch bound (config/config.go:60-61) → ``maxOffsetsPerTrigger``
    (the 5 s half is the trigger interval, applied by the caller's
    writeStream, see streaming.ingest_stream.run_ingest_stream).

    Requires the spark-sql-kafka package on the classpath (standard on a
    real cluster; no broker exists in this sandbox — the decode path is
    unit-tested on literal bytes instead, mirroring the reference's own
    round-trip test).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", batch_size * n_partitions)
        .load()
    )
    return decode_avro_events(raw, "value", engine=engine)
