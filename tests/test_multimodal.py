"""Multimodal plumbing: schemas, mapInPandas batch contract, determinism.
Image decode is REAL for PPM/PGM/BMP/PNG (numpy codec), audio decode REAL
for WAV, video decode REAL for uncompressed AVI; the hash stub remains for
compressed codecs — both paths are under test."""

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
            if r.metadata.format == "jpeg":
                # real baseline JPEG from the driver-encoded pool
                assert bytes(r.content).startswith(b"\xff\xd8\xff")
                assert bytes(r.content) in MM._JPEG_POOL
                assert r.metadata.width == 8 and r.metadata.height == 8
            elif r.metadata.format == "png":
                # real 4x4 RGB PNG from the driver-encoded pool
                raw = bytes(r.content)
                assert raw[:8] == b"\x89PNG\r\n\x1a\n"
                assert raw in MM._PNG_POOL
                assert r.metadata.width == 4 and r.metadata.height == 4
            elif r.metadata.format == "gif":
                # real 4x4 GIF89a from the driver-encoded pool
                raw = bytes(r.content)
                assert raw[:6] == b"GIF89a"
                assert raw in MM._GIF_POOL
                assert r.metadata.width == 4 and r.metadata.height == 4
            else:
                # real 4x4 P6 PPM payload: header + 48 pixel bytes
                assert bytes(r.content).startswith(b"P6\n4 4\n255\n")
                assert len(r.content) == 11 + 48
                assert r.metadata.format == "ppm"
                assert r.metadata.width == 4 and r.metadata.height == 4
        elif r.media_type == "audio":
            # real RIFF/WAVE; payload family varies: PCM16, IMA ADPCM,
            # or G.711 mu/A-law — every one decodes for real
            import struct as _struct

            raw = bytes(r.content)
            assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
            code = _struct.unpack_from("<H", raw, 20)[0]
            assert code in (1, 6, 7, 0x11)
            if code == 1:
                # uncompressed pool: 44-byte header + 128 sample bytes
                assert len(raw) == 44 + 128
            assert r.metadata.format == "wav"
            assert r.metadata.sample_rate == 16000
        else:
            # real uncompressed AVI: RIFF container, 4 frames of 4x4 RGB
            raw = bytes(r.content)
            assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
            assert r.metadata.format == "avi"
            assert r.metadata.width == 4 and r.metadata.height == 4
            assert r.metadata.duration_ms == 400  # 4 frames @ 10 fps


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


def test_jpeg_payloads_decode_end_to_end(spark, sf_dir):
    import numpy as np
    import pytest

    from nexus_forge_spark.functions import imagecodec, jpegcodec

    media = _media(spark, sf_dir)
    jpegs = media.where(F.col("metadata.format") == "jpeg")
    rows = jpegs.limit(5).collect()
    assert rows, "hash split should yield some jpeg refs"
    feats = {
        (r.doc_id, r.media_ref): r
        for r in MM.extract_image_features(jpegs, dim=8).collect()
    }
    for r in rows:
        f = feats[(r.doc_id, r.media_ref)]
        assert (f.width, f.height, f.channels) == (8, 8, 3)
        # embedding comes from REAL decoded pixels, not the hash stub;
        # the pool mixes baseline (SOF0) and progressive (SOF2) payloads
        arr = imagecodec.decode_image(bytes(r.content))
        assert np.array_equal(arr, jpegcodec.decode_jpeg(bytes(r.content)))
        expect = imagecodec.block_mean_embedding(arr, dim=8)
        assert f.embedding == pytest.approx(expect)
    # both frame types present in the pool
    assert any(b"\xff\xc2" in p for p in MM._JPEG_POOL)
    assert any(b"\xff\xc0" in p for p in MM._JPEG_POOL)


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
        expected = len(range(0, max(durations[r.media_ref], 1), 10000))
        assert r["count"] == expected
    # frame timestamps are at the sampling grid; AVI payloads decode for
    # real and come back as genuine P6 PPM frames
    sample = frames.limit(5).collect()
    assert all(f.ts_ms % 10000 == 0 for f in sample)
    assert all(f.decoded for f in sample)
    assert all(bytes(f.frame).startswith(b"P6\n4 4\n255\n") for f in sample)


def test_video_frames_match_container_pixels(spark, sf_dir):
    """A sampled frame equals the corresponding frame decoded straight
    from the AVI container bytes."""
    from nexus_forge_spark.functions import imagecodec, videocodec

    media = _media(spark, sf_dir)
    row = media.where(F.col("media_type") == "video").limit(1).collect()[0]
    raw = bytes(row.content)
    frame = (
        MM.sample_video_frames(media, every_ms=100)
        .where(F.col("media_ref") == row.media_ref)
        .orderBy("frame_idx")
        .collect()
    )
    info = videocodec.parse_avi(raw)
    assert len(frame) == info["n_frames"]  # 100ms grid @ 10fps = every frame
    import numpy as np

    for f in frame:
        expect = videocodec.decode_frame(raw, f.frame_idx, info)
        got = imagecodec.decode_image(bytes(f.frame))
        np.testing.assert_array_equal(got, expect)


def test_video_features_real_decode(spark, sf_dir):
    media = _media(spark, sf_dir)
    feats = MM.extract_video_features(media)
    assert feats.schema == MM.VIDEO_FEATURES_SCHEMA
    rows = feats.limit(10).collect()
    assert rows
    for r in rows:
        assert r.decoded is True
        assert r.n_frames == 4 and r.fps == 10
        assert r.width == 4 and r.height == 4
        assert 0.0 <= r.mean_luma <= 1.0
        assert 0.0 < r.motion <= 1.0  # hash-noise frames always differ


def test_video_stub_path_flagged(spark):
    """Non-AVI video bytes route through the hash stub with decoded=False."""
    media = spark.createDataFrame(
        [("d1", "media://x", "video", bytearray(b"\x00" * 32),
          ("synthetic", 8, 8, 20000, 16000))],
        MM.MEDIA_SCHEMA,
    )
    frames = MM.sample_video_frames(media, every_ms=10000).collect()
    assert len(frames) == 2  # 20000ms metadata duration / 10000ms grid
    assert all(not f.decoded for f in frames)
    feat = MM.extract_video_features(media).collect()[0]
    assert feat.decoded is False


def test_resize_rewrites_metadata_and_bytes(spark, sf_dir):
    media = _media(spark, sf_dir)
    resized = MM.resize_images(media, 64, 64)
    assert resized.schema == media.schema
    rows = resized.limit(5).collect()
    from nexus_forge_spark.functions import imagecodec

    for r in rows:
        assert r.metadata.width == 64 and r.metadata.height == 64
        raw = bytes(r.content)
        if r.metadata.format == "png":
            # PNG stays PNG through the resize; decode proves real pixels
            assert raw[:8] == imagecodec.PNG_SIGNATURE
            assert imagecodec.decode_image(raw).shape == (64, 64, 3)
        else:
            # everything else re-encodes as a genuine 64x64 P6 PPM
            assert raw.startswith(b"P6\n64 64\n255\n")
            assert len(raw) == len(b"P6\n64 64\n255\n") + 64 * 64 * 3


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
    """Synthetic audio payloads are genuine WAVs across four codec
    families — PCM16 (64 samples @ 16 kHz, 4 ms), IMA ADPCM (256 @
    16 kHz, 16 ms), and G.711 mu/A-law (256 @ 8 kHz, 32 ms); the
    feature stage decodes ALL of them for real (decoded=True)."""
    media = _media(spark, sf_dir)
    feats = MM.extract_audio_features(media)
    rows = feats.limit(120).collect()
    assert rows
    for r in rows:
        assert r.decoded is True
        assert r.sample_rate in (16000, 8000)
        # PCM16 / ADPCM / G.711 pools respectively
        assert r.duration_ms in (4, 16, 32)
        assert (r.sample_rate == 8000) == (r.duration_ms == 32)
        assert 0.0 <= r.rms <= 1.0
        assert 0.0 <= r.zero_crossing_rate <= 1.0
        assert 0.0 <= r.spectral_centroid_hz <= 8000.0
    durations = {r.duration_ms for r in rows}
    assert durations == {4, 16, 32}  # every codec path exercised


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


def test_png_payloads_decode_end_to_end(spark, sf_dir):
    import numpy as np
    import pytest

    from nexus_forge_spark.functions import imagecodec

    media = _media(spark, sf_dir)
    pngs = media.where(F.col("metadata.format") == "png")
    rows = pngs.limit(5).collect()
    assert rows, "hash split should yield some png refs"
    feats = {
        (r.doc_id, r.media_ref): r
        for r in MM.extract_image_features(pngs, dim=8).collect()
    }
    for r in rows:
        raw = bytes(r.content)
        assert raw[:8] == imagecodec.PNG_SIGNATURE
        f = feats[(r.doc_id, r.media_ref)]
        assert (f.width, f.height, f.channels) == (4, 4, 3)
        arr = imagecodec.decode_image(raw)  # stdlib zlib inflate + unfilter
        expect = imagecodec.block_mean_embedding(arr, dim=8)
        assert f.embedding == pytest.approx(expect)


def test_image_dhash_resize_invariant_codec():
    import numpy as np

    from nexus_forge_spark.functions.imagecodec import image_dhash, resize_nearest

    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    b = resize_nearest(a, 64, 64)
    c = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    d = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    assert d(image_dhash(a), image_dhash(b)) == 0  # 2x NN upscale: same grid
    assert d(image_dhash(a), image_dhash(c)) > 12  # unrelated image: far


def test_image_dhash_signatures_real_and_stub(spark):
    import numpy as np

    from nexus_forge_spark.functions.imagecodec import encode_ppm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            ("d1", "media://a", "image", bytearray(encode_ppm(img)),
             ("ppm", 16, 16, None, None)),
            ("d2", "media://b", "image", bytearray(b"\x00unknown-format"),
             ("bin", 4, 4, None, None)),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r.media_ref: r for r in MM.image_dhash_signatures(media).collect()}
    assert out["media://a"].decoded is True
    assert out["media://b"].decoded is False
    from nexus_forge_spark.functions.imagecodec import image_dhash

    assert out["media://a"].dhash == image_dhash(img)


def test_image_dhash_neardup_query_two_tier(spark, sf_dir):
    from nexus_forge_spark.plans.driver_queries import QUERIES

    rows = QUERIES["image_dhash_neardup"][0](spark, sf_dir).collect()
    assert rows
    # exact-copy collapse happened: the payload pool repeats images, so at
    # least one perceptual cluster holds multiple copies
    assert any(r.n_copies > 1 for r in rows)
    # keeper_ref is the min media_ref of its cluster -> unique per row
    refs = [r.keeper_ref for r in rows]
    assert len(refs) == len(set(refs))


def test_audio_fingerprint_signatures_real_and_stub(spark):
    import numpy as np

    from nexus_forge_spark.functions.audiocodec import (
        audio_energy_hash,
        decode_wav,
        encode_wav,
    )

    sig = (np.sin(np.linspace(0, 40, 2000)) * np.linspace(1, 0.2, 2000)).astype(
        np.float32
    )
    wav = encode_wav(sig)
    media = spark.createDataFrame(
        [
            ("d1", "media://a", "audio", bytearray(wav),
             ("wav", None, None, 2000, None)),
            ("d2", "media://b", "audio", bytearray(b"\x00not-riff"),
             ("bin", None, None, 4, None)),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {
        r.media_ref: r for r in MM.audio_fingerprint_signatures(media).collect()
    }
    assert out["media://a"].decoded is True
    assert out["media://b"].decoded is False
    samples, _ = decode_wav(wav)
    assert out["media://a"].ahash == audio_energy_hash(samples)


def test_audio_hash_neardup_query_two_tier(spark, sf_dir):
    from nexus_forge_spark.plans.driver_queries import QUERIES

    rows = QUERIES["audio_hash_neardup"][0](spark, sf_dir).collect()
    assert rows
    # the synthetic payload pool repeats clips (PCM + ADPCM variants), so
    # exact-copy collapse yields multi-copy clusters
    assert any(r.n_copies > 1 for r in rows)
    refs = [r.keeper_ref for r in rows]
    assert len(refs) == len(set(refs))


def test_video_fingerprint_signatures_real_and_stub(spark):
    import numpy as np

    from nexus_forge_spark.functions.videocodec import encode_avi, video_dhash

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(4)]
    avi = encode_avi(frames)
    media = spark.createDataFrame(
        [
            ("d1", "media://v1", "video", bytearray(avi),
             ("avi", 8, 8, 400, None)),
            ("d2", "media://v2", "video", bytearray(b"\x00not-riff-avi"),
             ("bin", None, None, None, None)),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {
        r.media_ref: r for r in MM.video_fingerprint_signatures(media).collect()
    }
    assert out["media://v1"].decoded is True
    assert out["media://v1"].vhash == video_dhash(avi)
    assert out["media://v2"].decoded is False


def test_video_hash_neardup_query_two_tier(spark, sf_dir):
    from nexus_forge_spark.plans.driver_queries import QUERIES

    rows = QUERIES["video_hash_neardup"][0](spark, sf_dir).collect()
    assert rows
    assert any(r.n_copies > 1 for r in rows)
    refs = [r.keeper_ref for r in rows]
    assert len(refs) == len(set(refs))


def test_gif_payloads_decode_end_to_end(spark, sf_dir):
    import pytest

    from nexus_forge_spark.functions import imagecodec

    media = _media(spark, sf_dir)
    gifs = media.where(F.col("metadata.format") == "gif")
    rows = gifs.limit(5).collect()
    assert rows, "hash split should yield some gif refs"
    feats = {
        (r.doc_id, r.media_ref): r
        for r in MM.extract_image_features(gifs, dim=8).collect()
    }
    for r in rows:
        raw = bytes(r.content)
        assert raw[:6] == b"GIF89a"
        f = feats[(r.doc_id, r.media_ref)]
        assert (f.width, f.height, f.channels) == (4, 4, 3)
        arr = imagecodec.decode_image(raw)  # palette + LZW decode
        expect = imagecodec.block_mean_embedding(arr, dim=8)
        assert f.embedding == pytest.approx(expect)


def test_fetch_media_bytes_file_scheme_end_to_end(spark, sf_dir, tmp_path):
    """S13 byte-fetch differential: materialize every image payload as a
    local file, strip content, point media_ref at file:// paths, fetch in
    the Arrow-batched stage, and require features IDENTICAL to the
    embedded-content run — with decoded geometry on 100% of image rows
    (every image format in the synthetic corpus now decodes for real)."""
    media = _media(spark, sf_dir).where(F.col("media_type") == "image")
    rows = media.limit(40).collect()
    assert rows
    refs = []
    for i, r in enumerate(rows):
        p = tmp_path / f"m{i}.bin"
        p.write_bytes(bytes(r.content))
        refs.append((r.doc_id, f"file://{p}", r.media_type, r.metadata))
    base = spark.createDataFrame(
        [(d, ref, t, None, m) for (d, ref, t, m) in refs],
        MM.MEDIA_SCHEMA,
    )
    fetched = MM.fetch_media_bytes(base)
    frows = fetched.collect()
    assert all(fr.fetched for fr in frows)
    assert all(fr.content is not None for fr in frows)

    feats_fetched = sorted(
        (tuple(r)[2:] for r in MM.extract_image_features(fetched.drop("fetched")).collect()),
    )
    embedded = spark.createDataFrame(
        [
            (d, ref, t, bytes(rows[i].content), m)
            for i, (d, ref, t, m) in enumerate(refs)
        ],
        MM.MEDIA_SCHEMA,
    )
    feats_embedded = sorted(
        (tuple(r)[2:] for r in MM.extract_image_features(embedded).collect()),
    )
    assert feats_fetched == feats_embedded
    # decode-verified: every image row reports real pixel geometry
    assert all(f[0] == 4 or f[0] == 8 for f in feats_fetched)  # width
    # unreachable ref stays honest: NULL content, fetched=false
    bad = spark.createDataFrame(
        [(0, "file:///nonexistent/x.bin", "image", None, None)],
        MM.MEDIA_SCHEMA,
    )
    brow = MM.fetch_media_bytes(bad).collect()[0]
    assert brow.content is None and brow.fetched is False
    # embedded content passes through untouched, fetched=false
    keep = spark.createDataFrame(
        [(1, "media://x", "image", b"P6\n1 1\n255\nabc", None)],
        MM.MEDIA_SCHEMA,
    )
    krow = MM.fetch_media_bytes(keep).collect()[0]
    assert bytes(krow.content) == b"P6\n1 1\n255\nabc" and krow.fetched is False
