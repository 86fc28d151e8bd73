"""Multimodal plumbing: schema, Arrow batch shapes, stub boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dp_search_data_importer_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    frame_sample_plan,
    media_stats,
    synthetic_media,
    _fake_features,
)


def test_media_schema_and_determinism(spark):
    a = synthetic_media(spark, n=30).collect()
    b = synthetic_media(spark, n=30).collect()
    assert sorted(r["media_id"] for r in a) == list(range(30))
    assert {r["media_id"]: bytes(r["payload"]) for r in a} == {
        r["media_id"]: bytes(r["payload"]) for r in b
    }


def test_decode_features_stub(spark):
    media = synthetic_media(spark, n=12)
    feats = decode_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r["features"])
    # engine result == reference kernel on the same payload
    payload = bytes(media.filter(F.col("media_id") == 3).collect()[0]["payload"])
    got = next(r for r in feats if r["media_id"] == 3)["features"]
    assert got == _fake_features(payload)


def test_decode_strict_raises_without_decoder(spark):
    media = synthetic_media(spark, n=3)
    from dp_search_data_importer_spark.operators import multimodal as mm

    if mm._real_decoder_available():
        pytest.skip("real decoder present")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_features(media, strict=True).collect()


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, n=30)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert rows, "some videos have duration > 0"
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    durs = {r["media_id"]: r["meta"]["duration_ms"]
            for r in media.filter(F.col("kind") == "video").collect()}
    for mid, frames in by_media.items():
        assert frames == list(range(0, durs[mid], 1000))


def test_media_stats_projection(spark):
    media = synthetic_media(spark, n=30)
    rows = {r["kind"]: r for r in media_stats(media).collect()}
    assert set(rows) == {"image", "audio", "video"}
    assert all(r["total_bytes"] > 0 for r in rows.values())


def test_decode_features_real_branch_when_pil_available(spark):
    """Round 3: the real image branch decodes actual pixels (dimensions,
    mean channels) when PIL exists — skipped cleanly otherwise, like the
    spark-avro jar test."""
    import pytest

    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    import PIL.Image

    from dp_search_data_importer_spark.operators import multimodal as mm

    buf = io.BytesIO()
    PIL.Image.new("RGB", (32, 16), color=(255, 0, 0)).save(buf, format="PNG")
    png = buf.getvalue()
    rows = [(1, 1, "image", bytearray(png),
             {"mime": "image/png", "width": 32, "height": 16,
              "duration_ms": 0})]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = mm.decode_features(media, decoder="real").collect()[0]
    f = got["features"]
    assert f[0] == 32.0 and f[1] == 16.0           # real decoded dims
    assert abs(f[3] - 1.0) < 1e-9 and f[4] == 0.0  # solid red: mean_R=1
    assert abs(f[7] - 2.0) < 1e-9                   # aspect ratio


def test_decode_features_real_branch_gated_without_pil(spark):
    """Without PIL, decoder='real'/strict=True must raise the documented
    NotImplementedError and the fake default must be unaffected."""
    import pytest

    from dp_search_data_importer_spark.operators import multimodal as mm

    if mm._real_decoder_available():
        pytest.skip("PIL present: gate test not applicable")
    media = mm.synthetic_media(spark, 6)
    with pytest.raises(Exception) as ei:
        mm.decode_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)
    assert mm.decode_features(media, decoder="auto").count() == 6


def test_decode_features_real_wav_audio(spark):
    """Round 4: the real audio branch parses actual PCM WAV samples with
    the stdlib wave module — sample rate, channels, duration, RMS, peak
    from a generated stereo sine/constant signal; no librosa required."""
    import io
    import math
    import struct
    import wave

    from dp_search_data_importer_spark.operators import multimodal as mm

    rate, secs = 8000, 2
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        amp = 0.5
        for i in range(rate * secs):
            left = int(amp * 32767 * math.sin(2 * math.pi * 440 * i / rate))
            right = 0  # silent channel
            w.writeframesraw(struct.pack("<hh", left, right))
    wav = buf.getvalue()

    rows = [(1, 1, "audio", bytearray(wav),
             {"mime": "audio/wav", "width": 0, "height": 0,
              "duration_ms": secs * 1000})]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    f = mm.decode_features(media, decoder="real").collect()[0]["features"]
    assert f[0] == float(rate)           # sample rate
    assert f[1] == 2.0                   # channels
    assert abs(f[2] - secs) < 1e-9       # duration
    assert abs(f[4] - 0.5 / math.sqrt(2)) < 0.01  # sine RMS = A/√2
    assert f[5] == 0.0                   # silent channel RMS
    assert 0.49 <= f[6] <= 0.51          # peak ≈ amplitude
    assert f[7] == 2.0                   # sample width bytes

    # non-WAV audio payload hits the honest gate, not a cryptic parse error
    bad = spark.createDataFrame(
        [(2, 1, "audio", bytearray(b"not a wav"),
          {"mime": "audio/wav", "width": 0, "height": 0, "duration_ms": 0})],
        mm.MEDIA_SCHEMA)
    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|PCM WAV"):
        mm.decode_features(bad, decoder="real").collect()


def test_truncated_wav_raises_stub_boundary_error():
    """A WAV whose data chunk is not a multiple of the frame size must
    raise the descriptive NotImplementedError stub-boundary signal, not
    an opaque numpy error (ADVICE r4)."""
    import io
    import struct
    import wave

    import pytest as _pytest

    from dp_search_data_importer_spark.operators.multimodal import (
        _real_audio_features,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 100, -100, 200, -200))
    payload = bytearray(buf.getvalue())
    # chop one byte off the data chunk WITHOUT patching the declared data
    # size: wave trusts the header, readframes returns a partial frame,
    # and the decode guard (not numpy) must reject it
    payload = payload[:-1]
    with _pytest.raises(NotImplementedError, match="malformed|truncated"):
        _real_audio_features(bytes(payload))


def test_real_video_features_with_av():
    """Real video branch: dimensions/frames/duration/fps from an actual
    container when PyAV exists — skipped cleanly otherwise, like the PIL
    and spark-avro gates."""
    import io

    import pytest

    av = pytest.importorskip("av")
    import numpy as np

    from dp_search_data_importer_spark.operators.multimodal import (
        _real_video_features,
    )

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=10)
        stream.width, stream.height = 64, 48
        stream.pix_fmt = "yuv420p"
        for i in range(10):
            frame = av.VideoFrame.from_ndarray(
                np.full((48, 64, 3), i * 20, dtype=np.uint8), format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)
    feats = _real_video_features(buf.getvalue())
    assert feats[0] == 64.0 and feats[1] == 48.0
    assert feats[2] == 10.0            # frames
    assert abs(feats[3] - 1.0) < 0.2   # ~1s at 10 fps
    assert abs(feats[4] - 10.0) < 0.1  # fps


def test_real_video_gate_without_av():
    """Without av, video under decoder='real' raises the documented
    stub-boundary error."""
    import pytest

    from dp_search_data_importer_spark.operators.multimodal import (
        _av_available,
        _real_video_features,
    )

    if _av_available():
        pytest.skip("av present: gate test not applicable")
    with pytest.raises(NotImplementedError, match="requires av"):
        _real_video_features(b"\x00\x00\x00\x18ftypmp42")
