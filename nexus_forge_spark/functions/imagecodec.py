"""Pure-numpy image codecs: PPM (P6) / PGM (P5) / 24-bit BMP / PNG /
baseline JPEG (the JPEG entropy/DCT layers live in jpegcodec.py).

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


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def sniff_format(content: bytes) -> str | None:
    """'ppm' | 'pgm' | 'bmp' | 'png' | 'jpeg' | 'gif' for decodable
    payloads, else None."""
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"P5":
        return "pgm"
    if content[:2] == b"BM":
        return "bmp"
    if content[:8] == PNG_SIGNATURE:
        return "png"
    if content[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if content[:4] == b"GIF8":
        return "gif"
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
    if fmt == "png":
        return _decode_png(bytes(content))
    if fmt == "gif":
        return _decode_gif(bytes(content))
    if fmt == "jpeg":
        from nexus_forge_spark.functions import jpegcodec

        try:
            # routes baseline (SOF0/1) and progressive (SOF2) payloads
            return jpegcodec.decode_jpeg(bytes(content))
        except jpegcodec.JpegDecodeError as exc:
            raise ImageDecodeError(str(exc)) from exc
    raise ImageDecodeError("unknown image format")


def _decode_png(buf: bytes) -> np.ndarray:
    """PNG decode with stdlib zlib: 8-bit gray (type 0), RGB (2), gray+alpha
    (4), RGBA (6), non-interlaced; all five scanline filters unfiltered.
    Palette/16-bit/interlaced images raise ImageDecodeError."""
    import zlib

    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    n = len(buf)
    while pos + 8 <= n:
        length = struct.unpack_from(">I", buf, pos)[0]
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ImageDecodeError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in (0, 2, 4, 6):
                raise ImageDecodeError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ImageDecodeError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ImageDecodeError("truncated PNG")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) < height * (stride + 1):
        raise ImageDecodeError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need left -> sequential
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = cur[x - channels] if x >= channels else 0
                up = int(prev[x])
                if f == 1:
                    cur[x] = (line[x] + left) & 0xFF
                elif f == 3:
                    cur[x] = (line[x] + ((left + up) >> 1)) & 0xFF
                else:  # Paeth predictor
                    ul = int(prev[x - channels]) if x >= channels else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ImageDecodeError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(height, width, channels)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF variable-width LZW (LSB-first bit packing): clear code resets
    the table, EOI stops, code width grows after the table fills each
    power of two up to 12 bits."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code_size)]
    table += [b"", b""]  # clear + eoi placeholders

    bitpos = 0
    width = min_code_size + 1
    prev: bytes | None = None
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ImageDecodeError("corrupt GIF LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ImageDecodeError("truncated GIF LZW stream")
    return bytes(out[:n_pixels])


def _decode_gif(buf: bytes) -> np.ndarray:
    """GIF87a/89a first frame -> (H, W, 3) uint8: logical screen
    descriptor + global/local color table, extension blocks skipped,
    variable-width LZW, interlace pass reordering."""
    if len(buf) < 13:
        raise ImageDecodeError("truncated GIF header")
    flags = buf[10]
    i = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(buf, np.uint8, n * 3, i).reshape(n, 3)
        i += n * 3
    while i < len(buf):
        b = buf[i]
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(buf) and buf[i] != 0:
                i += 1 + buf[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            w, h = struct.unpack_from("<HH", buf, i + 5)
            iflags = buf[i + 9]
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(buf, np.uint8, n * 3, i).reshape(n, 3)
                i += n * 3
            if pal is None:
                raise ImageDecodeError("GIF frame has no color table")
            min_code = buf[i]
            i += 1
            data = bytearray()
            while i < len(buf) and buf[i] != 0:
                size = buf[i]
                data += buf[i + 1 : i + 1 + size]
                i += 1 + size
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code, w * h), np.uint8
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                order = [
                    r
                    for start, step in _GIF_INTERLACE_PASSES
                    for r in range(start, h, step)
                ]
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return pal[np.minimum(idx, len(pal) - 1)]
        elif b == 0x3B:  # trailer
            break
        else:
            raise ImageDecodeError(f"unknown GIF block 0x{b:02x}")
    raise ImageDecodeError("GIF contains no image frame")


def encode_gif(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> single-frame GIF89a with a per-image palette
    (requires <= 256 distinct colors) and REAL variable-width LZW."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ImageDecodeError("encode_gif expects (H, W, 3)")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ImageDecodeError("encode_gif: > 256 distinct colors")
    # LZW min code size >= 2; the stored color table must then hold
    # exactly 2^min_code entries (the size field and the code size share
    # one exponent)
    psize = 2
    while psize < len(colors):
        psize *= 2
    min_code = max(2, psize.bit_length() - 1)
    pal = np.zeros((1 << min_code, 3), np.uint8)
    pal[: len(colors)] = colors

    # The emission WIDTH follows a simulation of the decoder's table (which
    # lags the encoder's by one entry — the decoder adds an entry only when
    # the NEXT code arrives), so the width-growth timing matches any
    # spec-conforming decoder by construction instead of by off-by-one luck.
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = (1 << min_code) + 2
    codes: list[tuple[int, int]] = []
    table: dict[bytes, int] = {}
    next_code = 0
    dec_size = 0
    width = 0
    k = 0  # data codes emitted since the last clear

    def reset() -> None:
        nonlocal table, next_code, dec_size, width, k
        table = {bytes([i]): i for i in range(1 << min_code)}
        next_code = eoi + 1
        dec_size = base
        width = min_code + 1
        k = 0

    def emit_data(code: int) -> None:
        nonlocal k, dec_size, width
        codes.append((code, width))
        k += 1
        if k >= 2 and dec_size < 4096:
            dec_size += 1
            if dec_size == (1 << width) and width < 12:
                width += 1

    reset()
    codes.append((clear, width))
    seq = b""
    for px in idx.astype(np.uint8).tobytes():
        nxt = seq + bytes([px])
        if nxt in table:
            seq = nxt
            continue
        emit_data(table[seq])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:
            codes.append((clear, width))
            reset()
        seq = bytes([px])
    if seq:
        emit_data(table[seq])
    codes.append((eoi, width))

    acc = bitlen = 0
    packed = bytearray()
    for code, cw in codes:
        acc |= code << bitlen
        bitlen += cw
        while bitlen >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            bitlen -= 8
    if bitlen:
        packed.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (min_code - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code)
    for off in range(0, len(packed), 255):
        chunk = packed[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 1|3) uint8 -> P5/P6 bytes (the operators' re-encode format)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    magic = b"P6" if ch == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 1|2|3|4) uint8 -> PNG bytes (filter 0 scanlines, one zlib
    IDAT) — fixture/round-trip encoder for the stdlib-only decoder."""
    import zlib

    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample via integer index maps — pure numpy."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[rows][:, cols]


def grayscale(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) -> (H, W) float32 luma (ITU-R 601 weights); alpha channels
    (gray+alpha, RGBA) are ignored."""
    a = arr.astype(np.float32)
    if a.shape[2] in (1, 2):
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

def image_dhash(arr: np.ndarray) -> int:
    """64-bit difference hash (dHash) — the classic perceptual image
    fingerprint: luma is resampled to a 9x8 grid and each bit records
    whether brightness rises between horizontal neighbours, so the hash
    tracks image STRUCTURE and survives re-encoding/rescaling while
    exact byte hashes do not.  Returns a SIGNED 64-bit int (two's
    complement wrap) so it stores directly in a Spark LongType column;
    compare with bit_count(a XOR b).
    """
    g = grayscale(arr)
    grid = resize_nearest(g[:, :, None], 9, 8)[:, :, 0]
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (1 if grid[r, c + 1] > grid[r, c] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits
