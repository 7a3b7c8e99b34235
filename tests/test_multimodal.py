"""Multimodal plumbing: schemas, mapInPandas batch contract, determinism.
Image decode is REAL for PPM/PGM/BMP (numpy codec); audio/video bodies
stay stubbed — both paths are under test."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_forge_spark.operators import multimodal as MM
from nexus_forge_spark.sources import flat_to_interleaved, load_table


def _media(spark, sf_dir):
    docs = flat_to_interleaved(load_table(spark, "documents", sf_dir))
    return MM.media_from_documents(docs)


def test_media_schema_and_payload(spark, sf_dir):
    media = _media(spark, sf_dir)
    assert media.schema.simpleString() == MM.MEDIA_SCHEMA.simpleString()  # mod nullability
    rows = media.limit(10).collect()
    assert rows
    for r in rows:
        assert r.media_ref.startswith("media://")
        assert r.media_type in ("image", "audio", "video")
        if r.media_type == "image":
            # real 4x4 P6 PPM payload: header + 48 pixel bytes
            assert bytes(r.content).startswith(b"P6\n4 4\n255\n")
            assert len(r.content) == 11 + 48
            assert r.metadata.format == "ppm"
            assert r.metadata.width == 4 and r.metadata.height == 4
        elif r.media_type == "audio":
            # real PCM16 mono WAV: 44-byte RIFF header + 128 sample bytes
            assert bytes(r.content).startswith(b"RIFF")
            assert len(r.content) == 44 + 128
            assert r.metadata.format == "wav"
            assert r.metadata.sample_rate == 16000
        else:
            assert len(r.content) == 16  # md5-derived stub payload
            assert 1 <= r.metadata.width <= 1920


def test_image_features_batch_contract(spark, sf_dir):
    media = _media(spark, sf_dir)
    feats = MM.extract_image_features(media, dim=8)
    assert feats.schema == MM.IMAGE_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == media.where(F.col("media_type") == "image").count()
    for r in rows[:5]:
        assert len(r.embedding) == 8
        assert all(-1.0 <= v <= 1.0 for v in r.embedding)
        assert r.channels == 3


def test_image_features_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    a = sorted(map(str, MM.extract_image_features(media).collect()))
    b = sorted(map(str, MM.extract_image_features(media.repartition(7)).collect()))
    assert a == b  # partitioning does not change results


def test_video_frame_sampling(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = MM.sample_video_frames(media, every_ms=10000)
    assert frames.schema == MM.FRAME_SCHEMA
    got = frames.groupBy("media_ref").count().collect()
    durations = {
        r.media_ref: r.metadata.duration_ms
        for r in media.where(F.col("media_type") == "video").collect()
    }
    for r in got:
        expected = len(range(0, durations[r.media_ref], 10000))
        assert r["count"] == expected
    # frame timestamps are at the sampling grid
    sample = frames.limit(5).collect()
    assert all(f.ts_ms % 10000 == 0 for f in sample)


def test_resize_rewrites_metadata_and_bytes(spark, sf_dir):
    media = _media(spark, sf_dir)
    resized = MM.resize_images(media, 64, 64)
    assert resized.schema == media.schema
    rows = resized.limit(5).collect()
    for r in rows:
        assert r.metadata.width == 64 and r.metadata.height == 64
        # real resample: output is a genuine 64x64 P6 PPM
        assert bytes(r.content).startswith(b"P6\n64 64\n255\n")
        assert len(r.content) == len(b"P6\n64 64\n255\n") + 64 * 64 * 3


def test_missing_content_raises_not_implemented(spark):
    media = spark.createDataFrame(
        [("d1", "media://x", "image", None, ("synthetic", 1, 1, 1, 16000))],
        MM.MEDIA_SCHEMA,
    )
    import pytest as _pytest

    with _pytest.raises(Exception) as exc:
        MM.extract_image_features(media).collect()
    assert "NotImplementedError" in str(exc.value) or "not wired" in str(exc.value)


def test_audio_features_real_wav_decode(spark, sf_dir):
    """Synthetic audio payloads are genuine PCM16 WAVs; the feature stage
    decodes them for real (decoded=True) with consistent duration/rate."""
    media = _media(spark, sf_dir)
    feats = MM.extract_audio_features(media)
    rows = feats.limit(10).collect()
    assert rows
    for r in rows:
        assert r.decoded is True
        assert r.sample_rate == 16000
        assert r.duration_ms == 4  # 64 samples @ 16 kHz
        assert 0.0 <= r.rms <= 1.0
        assert 0.0 <= r.zero_crossing_rate <= 1.0
        assert 0.0 <= r.spectral_centroid_hz <= 8000.0


def test_audio_features_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir)
    a = sorted(map(tuple, MM.extract_audio_features(media).limit(5).collect()))
    b = sorted(map(tuple, MM.extract_audio_features(media).limit(5).collect()))
    assert a == b


def test_audio_stub_path_flagged(spark):
    """Non-WAV audio bytes route through the hash stub with decoded=False."""
    media = spark.createDataFrame(
        [("d1", "media://x", "audio", bytearray(b"\x00" * 32),
          ("synthetic", 1, 1, 1, 16000))],
        MM.MEDIA_SCHEMA,
    )
    row = MM.extract_audio_features(media).collect()[0]
    assert row.decoded is False
