"""Pure-numpy image codecs: PPM (P6) / PGM (P5) / 24-bit BMP.

Real decode/encode for the formats a numpy-only container can handle —
no PIL/ffmpeg needed.  These are the decode bodies behind the multimodal
operators' Arrow-batched stages (operators/multimodal.py): formats here
are decoded for real; anything else falls back to the clearly-marked
stub path.

Format notes (public specs):
* PPM P6 / PGM P5: ASCII header "P6\\n<w> <h>\\n<maxval>\\n" (whitespace and
  '#' comments allowed between tokens), then raw big-endian samples —
  3 bytes/pixel RGB for P6, 1 byte/pixel gray for P5 (maxval <= 255).
* BMP: 14-byte file header ('BM', pixel-data offset at byte 10) +
  BITMAPINFOHEADER (width/height/bpp/compression at fixed offsets);
  only biCompression=0, 24 bpp handled; rows are 4-byte aligned and
  stored bottom-up (negative height = top-down), samples are BGR.
"""

from __future__ import annotations

import struct

import numpy as np


class ImageDecodeError(ValueError):
    pass


def sniff_format(content: bytes) -> str | None:
    """'ppm' | 'pgm' | 'bmp' for decodable payloads, else None."""
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"P5":
        return "pgm"
    if content[:2] == b"BM":
        return "bmp"
    return None


def _pnm_tokens(buf: bytes, count: int) -> tuple[list[int], int]:
    """Read `count` ASCII integer tokens after the magic, skipping
    whitespace and # comments; returns (values, offset_past_last_ws)."""
    vals: list[int] = []
    i = 2  # past magic
    n = len(buf)
    while len(vals) < count:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i : i + 1] == b"#":
            while i < n and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ImageDecodeError("truncated PNM header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i + 1  # single whitespace byte after maxval


def decode_image(content: bytes) -> np.ndarray:
    """bytes -> (H, W, C) uint8 array.  Raises ImageDecodeError for
    unsupported/corrupt payloads."""
    fmt = sniff_format(bytes(content))
    if fmt in ("ppm", "pgm"):
        (w, h, maxval), off = _pnm_tokens(bytes(content), 3)
        if maxval > 255:
            raise ImageDecodeError("16-bit PNM not supported")
        ch = 3 if fmt == "ppm" else 1
        need = w * h * ch
        if len(content) - off < need:
            raise ImageDecodeError("truncated PNM payload")
        data = np.frombuffer(content, dtype=np.uint8, count=need, offset=off)
        return data.reshape(h, w, ch)
    if fmt == "bmp":
        buf = bytes(content)
        if len(buf) < 54:
            raise ImageDecodeError("truncated BMP header")
        data_off = struct.unpack_from("<I", buf, 10)[0]
        w, h_raw = struct.unpack_from("<ii", buf, 18)
        bpp = struct.unpack_from("<H", buf, 28)[0]
        compression = struct.unpack_from("<I", buf, 30)[0]
        if bpp != 24 or compression != 0:
            raise ImageDecodeError(f"unsupported BMP (bpp={bpp}, comp={compression})")
        top_down = h_raw < 0
        h = abs(h_raw)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        need = stride * h
        raw = np.frombuffer(buf, dtype=np.uint8, count=need, offset=data_off)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[:, :, ::-1].copy()  # BGR -> RGB
    raise ImageDecodeError("unknown image format")


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 1|3) uint8 -> P5/P6 bytes (the operators' re-encode format)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample via integer index maps — pure numpy."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[rows][:, cols]


def grayscale(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) -> (H, W) float32 luma (ITU-R 601 weights)."""
    a = arr.astype(np.float32)
    if a.shape[2] == 1:
        return a[:, :, 0]
    return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]


def block_mean_embedding(arr: np.ndarray, dim: int = 8) -> list[float]:
    """Deterministic real features: resize luma to sqrt(dim) x sqrt(dim)-ish
    grid via block means, scaled to [-1, 1] — a model-free embedding the
    ANN operators can consume."""
    side = max(1, int(np.sqrt(dim)))
    g = grayscale(arr)
    gr = resize_nearest(g[:, :, None] if g.ndim == 2 else g, side, side)
    flat = (gr.reshape(-1).astype(np.float32) / 255.0) * 2 - 1
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, flat.size)] = flat[:dim]
    return [float(x) for x in out]
