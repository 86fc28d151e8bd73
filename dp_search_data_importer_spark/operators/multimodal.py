"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schema, partitioning, Arrow batch shapes, UDF
signatures — is real and tested; the actual media DECODE is stubbed behind
guarded imports (PIL/librosa/av are not in this container): with no decoder
available, ``decode_features`` either raises ``NotImplementedError``
(``strict=True``) or produces a deterministic fake feature vector derived
from the payload bytes (default; stable for tests/benchmarks).

Scale shape: media payloads are the widest column by far — every operator
here projects payload-free outputs so Parquet column pruning keeps the bytes
out of any downstream shuffle; feature extraction is one narrow Arrow pass.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("doc_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("payload", T.BinaryType()),   # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_DIM = 8

_KINDS = ("image", "audio", "video")
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = _KINDS[i % 3]
                payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 8)
                rows.append({
                    "media_id": i, "doc_id": i // 3, "kind": kind,
                    "payload": payload,
                    "meta": {"mime": _MIME[kind],
                             "width": 64 + (i % 16) * 16 if kind == "image" else 0,
                             "height": 64 + (i % 9) * 16 if kind == "image" else 0,
                             "duration_ms": (i % 40) * 500 if kind != "image" else 0},
                })
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in: md5 over the payload's lowercase hex encoding
    → dim floats in [0, 1). Hashing the hex string (not raw bytes) keeps the
    kernel reproducible in engines whose md5 is VARCHAR-only (DuckDB) — the
    oracle for ``media_features`` replays it exactly in SQL."""
    h = hashlib.md5((payload or b"").hex().encode()).digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (arr.astype(np.float64) / 2**32).tolist()


def _real_image_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real image branch (round 3): decode the payload with PIL and emit
    [width, height, n_channels, mean_R, mean_G, mean_B, std_gray, aspect]
    — real pixels flow when the decoder lib exists. Callers gate on
    :func:`_real_decoder_available`."""
    import io

    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload))
    rgb = img.convert("RGB")
    arr = np.asarray(rgb, dtype=np.float64)
    means = arr.mean(axis=(0, 1)) / 255.0
    gray = arr.mean(axis=2)
    feats = [float(img.width), float(img.height),
             float(len(img.getbands())),
             float(means[0]), float(means[1]), float(means[2]),
             float(gray.std() / 255.0),
             float(img.width / img.height) if img.height else 0.0]
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


def _real_audio_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio branch (round 4): PCM WAV parsed with the stdlib
    ``wave`` module — no librosa needed for the WAV container. Emits
    [sample_rate, n_channels, duration_s, rms_overall, rms_ch0, rms_ch1,
    peak, sample_width] from actual samples. Non-WAV audio payloads raise
    ``wave.Error`` (surface the stub boundary honestly rather than
    guessing)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            nframes = w.getnframes()
            raw = w.readframes(nframes)
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            "real audio decode handles PCM WAV only (librosa/av needed "
            f"for other codecs): {e}"
        ) from e
    # a truncated/malformed data chunk (len not a multiple of the frame
    # size) must surface the same descriptive stub-boundary error as a
    # non-WAV payload, not an opaque numpy reshape failure that kills the
    # whole Arrow batch (ADVICE r4)
    frame_bytes = sw * max(nch, 1)
    if sw not in (1, 2, 4) or frame_bytes == 0 \
            or len(raw) % frame_bytes != 0:
        raise NotImplementedError(
            f"real audio decode: malformed/truncated PCM WAV (sample "
            f"width {sw}, {nch} channels, {len(raw)} data bytes)")
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
               - 128.0) / 128.0
    else:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2**31
    arr = arr.reshape(-1, max(nch, 1))
    has = arr.size > 0
    rms_ch = np.sqrt((arr ** 2).mean(axis=0)) if has else np.zeros(max(nch, 1))
    feats = [
        float(rate), float(nch),
        float(nframes / rate) if rate else 0.0,
        float(np.sqrt((arr ** 2).mean())) if has else 0.0,
        float(rms_ch[0]) if nch >= 1 and has else 0.0,
        float(rms_ch[1]) if nch >= 2 and has else 0.0,
        float(np.abs(arr).max()) if has else 0.0,
        float(sw),
    ]
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


def _av_available() -> bool:
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def _real_video_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real video branch (round 5): container parsed with PyAV when the
    ``av`` package is importable (same gated pattern as the PIL image and
    stdlib-wave audio branches — the lib is absent from this sandbox, so
    the branch ships skip-clean-tested and honestly raises otherwise).
    Emits [width, height, n_frames, duration_s, fps, n_video_streams,
    n_audio_streams, bit_rate/1e6] from the actual container."""
    if not _av_available():
        raise NotImplementedError(
            "real video decode requires av — not installed; filter kinds "
            "or use decoder='fake'")
    import io

    import av

    try:
        with av.open(io.BytesIO(payload)) as container:
            vstreams = [s for s in container.streams if s.type == "video"]
            astreams = [s for s in container.streams if s.type == "audio"]
            if not vstreams:
                raise NotImplementedError(
                    "real video decode: container has no video stream")
            v = vstreams[0]
            n_frames = v.frames or sum(1 for _ in container.decode(v))
            dur = (float(container.duration) / av.time_base
                   if container.duration else 0.0)
            fps = float(v.average_rate) if v.average_rate else 0.0
            feats = [
                float(v.codec_context.width), float(v.codec_context.height),
                float(n_frames), dur, fps,
                float(len(vstreams)), float(len(astreams)),
                float(container.bit_rate or 0) / 1e6,
            ]
    except av.AVError as e:  # malformed container: same stub-boundary signal
        raise NotImplementedError(
            f"real video decode: unreadable container: {e}") from e
    return feats[:dim] + [0.0] * max(0, dim - len(feats))


def decode_features(media: DataFrame, strict: bool = False,
                    decoder: str = "fake") -> DataFrame:
    """(media_id, kind, features array<double>) via one Arrow pass.

    ``decoder``:
    - ``"fake"`` (default): the deterministic payload-hash kernel — stable
      across machines, replayed exactly by the ``media_features`` DuckDB
      oracle; keeps the pipeline testable end-to-end with no media libs.
    - ``"real"``: decode actual media — images via PIL (dimensions, mean
      channels, gray std, aspect), PCM WAV audio via the stdlib ``wave``
      module (sample rate, channels, duration, per-channel RMS, peak),
      video containers via PyAV when importable (dimensions, frames,
      duration, fps, streams); each lib absent ⇒ a descriptive
      ``NotImplementedError`` marks the stub boundary.
    - ``"auto"``: real when the decoder lib is importable, else fake.

    ``strict=True`` (back-compat) forces ``"real"`` and raises
    ``NotImplementedError`` when the libs are absent — clearly marking the
    stub boundary.
    """
    if strict:
        decoder = "real"
    if decoder == "auto":
        decoder = "real" if _real_decoder_available() else "fake"
    use_real = decoder == "real"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                feats = []
                for kind, p in zip(pdf["kind"], pdf["payload"]):
                    if kind == "image":
                        if not _real_decoder_available():
                            raise NotImplementedError(
                                "real image decode requires PIL — not "
                                "installed; use decoder='fake' (default) "
                                "for the deterministic stub"
                            )
                        feats.append(_real_image_features(p))
                    elif kind == "audio":
                        feats.append(_real_audio_features(p))
                    elif kind == "video":
                        feats.append(_real_video_features(p))
                    else:
                        raise NotImplementedError(
                            f"real {kind} decode unsupported; filter "
                            "kinds or use decoder='fake'"
                        )
            else:
                feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, schema="media_id long, kind string, features array<double>"
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per frame timestamp to decode —
    pure Catalyst (sequence + explode over meta.duration_ms), no payload
    touched (column pruning keeps the binary out of the shuffle)."""
    dur = F.col("meta.duration_ms")
    return (
        media.filter((F.col("kind") == "video") & (dur > 0))
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), dur - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_plan(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Image resize planning: per image, the aspect-preserving target
    dimensions fitting (max_w, max_h), never upscaling — pure Catalyst over
    the typed metadata; the payload bytes are never read (column pruning),
    and the actual pixel resample belongs behind the decode stub. This is
    the distributed half of a resize stage: plan cheaply over billions of
    rows, hand (media_id, out_w, out_h) to the decode kernel."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h,
                    F.lit(1.0))
    return (
        media.filter((F.col("kind") == "image")
                     & (F.col("meta.width") > 0) & (F.col("meta.height") > 0))
        .select(
            "media_id",
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.greatest(F.floor(w * scale), F.lit(1)).cast("long").alias("out_w"),
            F.greatest(F.floor(h * scale), F.lit(1)).cast("long").alias("out_h"),
            F.round(scale, 6).alias("scale"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind payload accounting — note .explain shows ReadSchema without
    re-reading payload bytes for the meta-only aggregates."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).cast("long").alias("total_bytes"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )
