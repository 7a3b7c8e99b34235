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


# ----------------------------------------------------------------- PNG


def test_png_roundtrip_rgb(rgb):
    enc = IC.encode_png(rgb)
    assert IC.sniff_format(enc) == "png"
    assert np.array_equal(IC.decode_image(enc), rgb)


def test_png_roundtrip_gray_and_rgba():
    gray = np.arange(20, dtype=np.uint8).reshape(4, 5, 1)
    assert np.array_equal(IC.decode_image(IC.encode_png(gray)), gray)
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    assert np.array_equal(IC.decode_image(IC.encode_png(rgba)), rgba)


def test_png_all_filters_decode():
    """Hand-build an IDAT using every scanline filter (None/Sub/Up/
    Average/Paeth) and check the unfiltering against the known source."""
    import struct as _struct
    import zlib

    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8).astype(np.int32)
    ch = 3
    stride = 4 * ch
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur = src[y].reshape(-1)
        enc = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = cur
    raw = b"".join(lines)

    def chunk(t, d):
        return _struct.pack(">I", len(d)) + t + d + _struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    buf = (
        IC.PNG_SIGNATURE
        + chunk(b"IHDR", _struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(IC.decode_image(buf), src.astype(np.uint8))


def test_png_unsupported_features_raise():
    import struct as _struct
    import zlib

    def chunk(t, d):
        return _struct.pack(">I", len(d)) + t + d + _struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    # 16-bit depth
    buf = IC.PNG_SIGNATURE + chunk(
        b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    )
    with pytest.raises(IC.ImageDecodeError):
        IC.decode_image(buf)
    # palette color type
    buf = IC.PNG_SIGNATURE + chunk(
        b"IHDR", _struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    )
    with pytest.raises(IC.ImageDecodeError):
        IC.decode_image(buf)


# ---- round-4: GIF (palette + variable-width LZW) -------------------------


def _rand_paletted(rng, h, w, ncol):
    import numpy as np

    pal = np.unique(
        rng.integers(0, 256, (ncol, 3), dtype=np.uint8), axis=0
    )
    return pal[rng.integers(0, len(pal), (h, w))]


def test_gif_roundtrip_fuzz():
    import numpy as np

    from nexus_forge_spark.functions import imagecodec as ic

    rng = np.random.default_rng(11)
    for _ in range(20):
        arr = _rand_paletted(
            rng, int(rng.integers(1, 64)), int(rng.integers(1, 64)),
            int(rng.integers(1, 257)),
        )
        gif = ic.encode_gif(arr)
        assert ic.sniff_format(gif) == "gif"
        assert (ic.decode_image(gif) == arr).all()


def test_gif_lzw_dictionary_reset_path():
    """Enough distinct contexts to fill the 4096-entry LZW table and force
    the mid-stream CLEAR + width reset."""
    import numpy as np

    from nexus_forge_spark.functions import imagecodec as ic

    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (256, 256), dtype=np.uint8)
    arr = np.stack([g, g // 2, 255 - g], axis=-1)
    assert (ic.decode_image(ic.encode_gif(arr)) == arr).all()


def test_gif_extension_blocks_skipped_and_interlace():
    """A GIF89a with a graphic-control extension and the interlace flag:
    extensions skip cleanly; interlaced rows come back in display order."""
    import struct

    import numpy as np

    from nexus_forge_spark.functions import imagecodec as ic

    rng = np.random.default_rng(3)
    arr = _rand_paletted(rng, 16, 8, 32)
    gif = bytearray(ic.encode_gif(arr))
    # splice a GCE extension (0x21 0xF9, 4-byte block, terminator) right
    # after the logical screen descriptor + GCT
    flags = gif[10]
    gct_len = 3 * (2 << (flags & 7))
    pos = 13 + gct_len
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    with_ext = bytes(gif[:pos]) + gce + bytes(gif[pos:])
    assert (ic.decode_image(with_ext) == arr).all()

    # interlace: rewrite the frame with rows in pass order + the flag set
    order = [r for s, t in ic._GIF_INTERLACE_PASSES for r in range(s, 16, t)]
    inter_rows = arr[order]
    gif2 = bytearray(ic.encode_gif(inter_rows))
    # set the interlace bit in the image descriptor (after LSD + GCT)
    flags2 = gif2[10]
    pos2 = 13 + 3 * (2 << (flags2 & 7))
    assert gif2[pos2] == 0x2C
    gif2[pos2 + 9] |= 0x40
    assert (ic.decode_image(bytes(gif2)) == arr).all()
