"""Round-trip tests for the pure-numpy uncompressed-AVI codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nexus_forge_spark.functions import videocodec as V


def _frames(n: int, h: int, w: int, seed: int = 0) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)
    ]


def test_roundtrip_exact_pixels():
    frames = _frames(3, 4, 4)
    raw = V.encode_avi(frames, fps=10)
    assert V.sniff_avi(raw)
    info = V.parse_avi(raw)
    assert (info["width"], info["height"]) == (4, 4)
    assert info["fps"] == 10
    assert info["n_frames"] == 3
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(V.decode_frame(raw, i, info), f)


def test_roundtrip_padded_stride():
    # width 3 -> 9-byte rows padded to 12: exercises the stride path
    frames = _frames(2, 5, 3, seed=7)
    raw = V.encode_avi(frames, fps=25)
    info = V.parse_avi(raw)
    assert info["fps"] == 25
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(V.decode_frame(raw, i, info), f)


def test_iter_frames_order():
    frames = _frames(4, 2, 2, seed=3)
    raw = V.encode_avi(frames)
    got = list(V.iter_frames(raw))
    assert len(got) == 4
    for a, b in zip(frames, got):
        np.testing.assert_array_equal(a, b)


def test_sniff_rejects_non_avi():
    assert not V.sniff_avi(b"RIFF....WAVE")
    assert not V.sniff_avi(b"\x89PNG\r\n\x1a\n")
    assert not V.sniff_avi(b"")


def test_parse_rejects_compressed():
    raw = bytearray(V.encode_avi(_frames(1, 2, 2)))
    # flip biCompression in strf from BI_RGB(0) to H264 (MJPG is now a
    # supported codec; anything inter-frame still rejects)
    i = raw.find(b"strf")
    # strf payload: biSize(4) biWidth(4) biHeight(4) planes(2) bits(2) comp(4)
    comp_off = i + 8 + 16
    raw[comp_off : comp_off + 4] = b"H264"
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        V.parse_avi(bytes(raw))


def test_parse_rejects_truncated_frame():
    frames = _frames(1, 4, 4)
    raw = bytearray(V.encode_avi(frames))
    # shrink the declared size of the 00db chunk below a full frame
    i = raw.find(b"00db")
    raw[i + 4 : i + 8] = struct.pack("<I", 10)
    info = V.parse_avi(bytes(raw))
    with pytest.raises(ValueError, match="truncated"):
        V.decode_frame(bytes(raw), 0, info)


def test_mjpeg_avi_roundtrip_within_jpeg_tolerance():
    rng = np.random.RandomState(3)
    frames = [
        (np.full((8, 8, 3), base, np.uint8)
         + rng.randint(0, 16, (8, 8, 3)).astype(np.uint8))
        for base in (16, 96, 192)
    ]
    avi = V.encode_avi(frames, fps=5, codec="MJPG", quality=92)
    info = V.parse_avi(avi)
    assert info["codec"] == "MJPG"
    assert (info["n_frames"], info["width"], info["height"]) == (3, 8, 8)
    for i, f in enumerate(frames):
        dec = V.decode_frame(avi, i, info)
        assert dec.shape == (8, 8, 3)
        # JPEG is lossy: bound the mean absolute error, not equality
        assert abs(dec.astype(int) - f.astype(int)).mean() < 8.0


def test_mjpeg_frames_are_standalone_jpegs():
    from nexus_forge_spark.functions.jpegcodec import decode_baseline_jpeg

    frames = [np.full((8, 8, 3), 50, np.uint8)]
    avi = V.encode_avi(frames, codec="MJPG")
    info = V.parse_avi(avi)
    off, size = info["frame_offsets"][0]
    arr = decode_baseline_jpeg(avi[off : off + size])
    assert arr.shape == (8, 8, 3)


def test_dib_codec_still_exact_and_rejects_unknown():
    frames = [np.arange(48, dtype=np.uint8).reshape(4, 4, 3)]
    avi = V.encode_avi(frames)  # default DIB
    assert V.parse_avi(avi)["codec"] == "DIB"
    assert (V.decode_frame(avi, 0) == frames[0]).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        V.encode_avi(frames, codec="H264")


def test_video_dhash_reencode_stable_unrelated_far():
    import numpy as np

    from nexus_forge_spark.functions.videocodec import encode_avi, video_dhash

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(4)]
    other = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(4)]
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
    h_dib = video_dhash(encode_avi(frames))
    h_mjpg = video_dhash(encode_avi(frames, codec="MJPG"))
    # lossy MJPG re-encode of the SAME frames: a couple of borderline
    # gradient bits at most (measured 1); unrelated clips ~25
    assert ham(h_dib, h_mjpg) <= 6
    assert ham(h_dib, video_dhash(encode_avi(other))) > 12


def test_video_dhash_majority_is_frame_order_free():
    import numpy as np

    from nexus_forge_spark.functions.videocodec import encode_avi, video_dhash

    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(3)]
    assert video_dhash(encode_avi(frames)) == video_dhash(
        encode_avi(frames[::-1])
    )
