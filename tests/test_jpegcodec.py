"""Pure-numpy baseline JPEG codec: encode/decode round trips, quality
behavior, restart markers, and rejection of non-baseline payloads (no
Spark needed)."""

import struct

import numpy as np
import pytest

from nexus_forge_spark.functions import imagecodec as IC
from nexus_forge_spark.functions import jpegcodec as JC


def _gradient_rgb(h=24, w=17):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 9) % 256, (xx * 11) % 256, ((yy + xx) * 5) % 256], axis=2
    ).astype(np.uint8)


def _rmse(a, b):
    return float(np.sqrt(((a.astype(float) - b.astype(float)) ** 2).mean()))


def test_color_roundtrip_high_quality():
    img = _gradient_rgb()
    enc = JC.encode_baseline_jpeg(img, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = JC.decode_baseline_jpeg(enc)
    assert dec.shape == img.shape
    assert _rmse(dec, img) < 3.0  # smooth content at q90 is near-lossless


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:19, 0:13]
    g = ((yy * 13 + xx * 7) % 256).astype(np.uint8)
    dec = JC.decode_baseline_jpeg(JC.encode_baseline_jpeg(g, quality=95))
    assert dec.shape == (19, 13, 1)
    assert _rmse(dec[:, :, 0], g) < 3.0


def test_odd_dimensions_cropped():
    # 9x5 forces 8x8 padding on both axes; decode must crop back
    img = _gradient_rgb(9, 5)
    dec = JC.decode_baseline_jpeg(JC.encode_baseline_jpeg(img, quality=85))
    assert dec.shape == (9, 5, 3)


def test_quality_tradeoff():
    img = _gradient_rgb(32, 32)
    hi = JC.encode_baseline_jpeg(img, quality=95)
    lo = JC.encode_baseline_jpeg(img, quality=10)
    assert len(lo) < len(hi)  # coarser quantization compresses harder
    assert _rmse(JC.decode_baseline_jpeg(hi), img) <= _rmse(
        JC.decode_baseline_jpeg(lo), img
    )


def test_noise_roundtrip_does_not_crash():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    dec = JC.decode_baseline_jpeg(JC.encode_baseline_jpeg(noise, quality=50))
    assert dec.shape == noise.shape


def test_restart_markers_roundtrip():
    img = _gradient_rgb(24, 24)  # 9 MCUs
    enc = JC.encode_baseline_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in enc  # DRI segment present
    assert bytes([0xFF, 0xD0]) in enc  # at least one RSTn
    no_rst = JC.encode_baseline_jpeg(img, quality=90)
    assert np.array_equal(
        JC.decode_baseline_jpeg(enc), JC.decode_baseline_jpeg(no_rst)
    )


def test_decode_image_dispatch():
    img = _gradient_rgb(8, 8)
    enc = JC.encode_baseline_jpeg(img, quality=90)
    assert IC.sniff_format(enc) == "jpeg"
    assert np.array_equal(IC.decode_image(enc), JC.decode_baseline_jpeg(enc))


def test_progressive_rejected():
    enc = bytearray(JC.encode_baseline_jpeg(_gradient_rgb(8, 8)))
    i = enc.index(bytes([0xFF, 0xC0]))
    enc[i + 1] = 0xC2  # claim progressive SOF
    with pytest.raises(JC.JpegDecodeError):
        JC.decode_baseline_jpeg(bytes(enc))
    with pytest.raises(IC.ImageDecodeError):  # dispatch converts the error
        IC.decode_image(bytes(enc))


def test_subsampled_rejected():
    enc = bytearray(JC.encode_baseline_jpeg(_gradient_rgb(8, 8)))
    i = enc.index(bytes([0xFF, 0xC0]))
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1), then per-comp id/hv/tq
    enc[i + 11] = 0x22  # claim 2x2 sampling for component 1
    with pytest.raises(JC.JpegDecodeError):
        JC.decode_baseline_jpeg(bytes(enc))


def test_truncated_rejected():
    enc = JC.encode_baseline_jpeg(_gradient_rgb(16, 16))
    with pytest.raises(JC.JpegDecodeError):
        JC.decode_baseline_jpeg(enc[: len(enc) // 2])
    with pytest.raises(JC.JpegDecodeError):
        JC.decode_baseline_jpeg(b"\x00\x01\x02")


def test_sixteen_bit_quant_rejected():
    enc = bytearray(JC.encode_baseline_jpeg(_gradient_rgb(8, 8)))
    i = enc.index(bytes([0xFF, 0xDB]))
    enc[i + 4] = 0x10  # Pq=1 (16-bit table)
    with pytest.raises(JC.JpegDecodeError):
        JC.decode_baseline_jpeg(bytes(enc))


def test_magnitude_extend_inverse():
    for v in [-1024, -255, -1, 0, 1, 2, 127, 1023]:
        cat, extra = JC._magnitude(v)
        assert JC._extend(extra, cat) == v


def test_dc_only_block_emits_eob():
    flat = np.full((8, 8), 128, dtype=np.uint8)
    enc = JC.encode_baseline_jpeg(flat, quality=75)
    dec = JC.decode_baseline_jpeg(enc)
    assert np.array_equal(dec[:, :, 0], flat)


def test_header_geometry():
    enc = JC.encode_baseline_jpeg(_gradient_rgb(10, 20), quality=80)
    i = enc.index(bytes([0xFF, 0xC0]))
    _prec, h, w, nc = struct.unpack_from(">BHHB", enc, i + 4)
    assert (h, w, nc) == (10, 20, 3)


# ---- round-4: progressive (SOF2) -----------------------------------------


def test_progressive_equals_baseline_reconstruction():
    """The decisive differential: identical quantization means the
    progressive pipeline must reconstruct the EXACT coefficient tensor
    the baseline pipeline does — decode(prog encode(x)) ==
    decode(base encode(x)) bit-for-bit, both with and without
    successive-approximation scans, color and grayscale."""
    import numpy as np

    from nexus_forge_spark.functions import jpegcodec as jc

    rng = np.random.default_rng(77)
    for trial in range(6):
        h, w = int(rng.integers(4, 48)), int(rng.integers(4, 48))
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        base = jc.decode_baseline_jpeg(jc.encode_baseline_jpeg(arr, quality=80))
        for succ in (False, True):
            prog = jc.decode_progressive_jpeg(
                jc.encode_progressive_jpeg(arr, quality=80, successive=succ)
            )
            assert np.array_equal(base, prog), (trial, succ)
    g = rng.integers(0, 256, (19, 7), dtype=np.uint8)
    assert np.array_equal(
        jc.decode_baseline_jpeg(jc.encode_baseline_jpeg(g, quality=60)),
        jc.decode_progressive_jpeg(
            jc.encode_progressive_jpeg(g, quality=60, successive=True)
        ),
    )


def test_decode_jpeg_routes_by_frame_marker():
    import numpy as np

    from nexus_forge_spark.functions import jpegcodec as jc

    arr = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    b = jc.encode_baseline_jpeg(arr, quality=90)
    p = jc.encode_progressive_jpeg(arr, quality=90)
    assert np.array_equal(jc.decode_jpeg(b), jc.decode_baseline_jpeg(b))
    assert np.array_equal(jc.decode_jpeg(p), jc.decode_progressive_jpeg(p))
    # baseline decoder still refuses progressive payloads loudly
    import pytest

    with pytest.raises(jc.JpegDecodeError):
        jc.decode_baseline_jpeg(p)


def test_progressive_smooth_image_quality():
    """Smooth gradients survive the full scan script with small error
    (sanity that the refinement scans actually refine)."""
    import numpy as np

    from nexus_forge_spark.functions import jpegcodec as jc

    x = np.linspace(0, 255, 64)
    arr = np.stack(
        [np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)), np.full((64, 64), 128.0)],
        axis=-1,
    ).astype(np.uint8)
    out = jc.decode_progressive_jpeg(
        jc.encode_progressive_jpeg(arr, quality=90, successive=True)
    )
    err = np.abs(out.astype(int) - arr.astype(int))
    assert err.mean() < 4 and err.max() < 40
