"""Pure-numpy image codec: decode/encode/resize round trips on
hand-constructed PPM/PGM/BMP payloads (no Spark needed)."""

import struct

import numpy as np
import pytest

from nexus_forge_spark.functions import imagecodec as IC


def _bmp_24(arr: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit BMP encoder for test fixtures."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pixel = bytearray()
    for row in arr[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # BGR
        line += b"\x00" * (stride - len(line))
        pixel += line
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixel), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel), 2835, 2835, 0, 0)
    return header + info + bytes(pixel)


@pytest.fixture()
def rgb():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)


def test_ppm_roundtrip(rgb):
    enc = IC.encode_ppm(rgb)
    assert IC.sniff_format(enc) == "ppm"
    dec = IC.decode_image(enc)
    assert np.array_equal(dec, rgb)


def test_pgm_roundtrip():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    enc = IC.encode_ppm(gray)
    assert IC.sniff_format(enc) == "pgm"
    assert np.array_equal(IC.decode_image(enc), gray)


def test_ppm_header_comments():
    raw = b"P6\n# a comment\n2 1\n# more\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    dec = IC.decode_image(raw)
    assert dec.shape == (1, 2, 3)
    assert dec.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_bmp_decode_matches_source(rgb):
    dec = IC.decode_image(_bmp_24(rgb))
    assert np.array_equal(dec, rgb)


def test_bmp_unsupported_bpp_raises():
    bad = bytearray(_bmp_24(np.zeros((2, 2, 3), dtype=np.uint8)))
    struct.pack_into("<H", bad, 28, 8)  # claim 8 bpp
    with pytest.raises(IC.ImageDecodeError):
        IC.decode_image(bytes(bad))


def test_resize_nearest_exact():
    arr = np.array([[[0], [10]], [[20], [30]]], dtype=np.uint8)
    up = IC.resize_nearest(arr, 4, 4)
    assert up.shape == (4, 4, 1)
    # each source pixel becomes a 2x2 block under integer index mapping
    assert up[0, 0, 0] == 0 and up[0, 3, 0] == 10
    assert up[3, 0, 0] == 20 and up[3, 3, 0] == 30


def test_block_mean_embedding_bounds(rgb):
    emb = IC.block_mean_embedding(rgb, dim=8)
    assert len(emb) == 8
    assert all(-1.0 <= v <= 1.0 for v in emb)
    # deterministic
    assert emb == IC.block_mean_embedding(rgb, dim=8)


def test_truncated_payload_raises():
    with pytest.raises(IC.ImageDecodeError):
        IC.decode_image(b"P6\n4 4\n255\n" + b"\x00" * 10)
