"""Pure-numpy AVI codec: uncompressed 24-bit DIB frames in a RIFF 'AVI '
container — encode, sniff, parse, per-frame decode.

The container subset is the classic VfW layout (RIFF('AVI ' LIST('hdrl'
avih LIST('strl' strh strf)) LIST('movi' '00db'*))): fixed-size headers,
BI_RGB (no compression), bottom-up BGR rows padded to 4 bytes — the format
every real tool (ffmpeg -c:v rawvideo, OpenCV VideoWriter('DIB ')) can
read and write.  This gives the video modality a REAL decode path with
stdlib struct + numpy only (no PIL/ffmpeg in the container); compressed
codecs (H.264 etc.) remain out of scope and fall to the marked stub.

Reference parity note: the reference treats media purely as attached
refs/files (kgforge/core/archetypes/store.py upload/download); decoding is
an LLM-data-pipeline extension, not a reference operator.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "sniff_avi",
    "encode_avi",
    "parse_avi",
    "decode_frame",
    "iter_frames",
    "video_dhash",
]


def sniff_avi(content: bytes) -> bool:
    return (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"AVI "
    )


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # BGR rows padded to 4-byte boundary


MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian in biCompression


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, codec: str = "DIB", quality: int = 90
) -> bytes:
    """frames: list of HxWx3 uint8 RGB arrays (same shape) -> AVI bytes.

    codec="DIB" writes uncompressed bottom-up BGR frames; codec="MJPG"
    writes Motion-JPEG (each frame an independent baseline JPEG from
    functions/jpegcodec.py) — the standard compressed-AVI profile that
    needs no inter-frame state, so frame decode stays random-access."""
    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w, ch = frames[0].shape
    if ch != 3:
        raise ValueError("encode_avi expects RGB frames")
    if codec not in ("DIB", "MJPG"):
        raise ValueError(f"unsupported codec {codec!r} (DIB or MJPG)")
    stride = _row_stride(w)

    def dib(arr: np.ndarray) -> bytes:
        # bottom-up row order, BGR channel order, padded rows
        bgr = arr[::-1, :, ::-1].astype(np.uint8)
        if stride == w * 3:
            return bgr.tobytes()
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = bgr.reshape(h, w * 3)
        return padded.tobytes()

    if codec == "MJPG":
        from nexus_forge_spark.functions.jpegcodec import encode_baseline_jpeg

        payloads = [encode_baseline_jpeg(f, quality=quality) for f in frames]
        chunk_tag, handler, bi_comp = b"00dc", b"MJPG", MJPG_FOURCC
    else:
        payloads = [dib(f) for f in frames]
        chunk_tag, handler, bi_comp = b"00db", b"DIB ", 0
    frame_size = max(len(pl) for pl in payloads)

    n = len(frames)
    usec_per_frame = int(1_000_000 / fps)
    avih = b"avih" + struct.pack(
        "<I14I",
        56,
        usec_per_frame,  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; 0x10=HASINDEX... keep simple
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    strh = b"strh" + struct.pack(
        "<I", 56
    ) + b"vids" + handler + struct.pack(
        "<IHHIIIIIIIIhhhh",
        0,  # dwFlags
        0, 0,  # wPriority, wLanguage
        0,  # dwInitialFrames
        1, fps,  # dwScale / dwRate -> fps
        0,  # dwStart
        n,  # dwLength (frames)
        frame_size,  # dwSuggestedBufferSize
        0xFFFFFFFF,  # dwQuality
        0,  # dwSampleSize
        0, 0, w, h,  # rcFrame
    )
    # BITMAPINFOHEADER: biCompression=0 (BI_RGB) or 'MJPG', biBitCount=24
    strf = b"strf" + struct.pack(
        "<IIiiHHIIiiII",
        40, 40, w, h, 1, 24, bi_comp, frame_size, 0, 0, 0, 0
    )

    def lst(tag: bytes, payload: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(payload)) + tag + payload

    strl = lst(b"strl", strh + strf)
    hdrl = lst(b"hdrl", avih + strl)
    movi_payload = b"".join(
        chunk_tag + struct.pack("<I", len(pl)) + pl + (b"\x00" * (len(pl) & 1))
        for pl in payloads
    )
    movi = lst(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a chunk run."""
    i = start
    while i + 8 <= end:
        tag = buf[i : i + 4]
        (size,) = struct.unpack_from("<I", buf, i + 4)
        yield tag, i + 8, size
        i += 8 + size + (size & 1)  # chunks are word-aligned


def parse_avi(content: bytes) -> dict:
    """-> {width, height, fps, n_frames, codec, frame_offsets: [(off, size)]}.
    Raises ValueError on anything that isn't 24-bit DIB or Motion-JPEG."""
    if not sniff_avi(content):
        raise ValueError("not an AVI container")
    width = height = fps = None
    codec = "DIB"
    frames: list[tuple[int, int]] = []

    def walk_list(start: int, end: int) -> None:
        nonlocal width, height, fps, codec
        for tag, off, size in _walk_chunks(content, start, end):
            if tag == b"LIST":
                walk_list(off + 4, off + size)
            elif tag == b"avih":
                vals = struct.unpack_from("<14I", content, off)
                usec = vals[0]
                fps = int(round(1_000_000 / usec)) if usec else None
                width, height = vals[8], vals[9]
            elif tag == b"strf":
                (
                    _bisz, bw, bh, _planes, bits, comp
                ) = struct.unpack_from("<Iii HHI".replace(" ", ""), content, off)
                if comp == MJPG_FOURCC:
                    codec = "MJPG"
                elif comp != 0 or bits != 24:
                    raise ValueError(
                        f"unsupported AVI codec (biCompression={comp}, "
                        f"biBitCount={bits}); BI_RGB 24-bit and MJPG "
                        "are decodable"
                    )
            elif tag in (b"00db", b"00dw", b"00dc"):
                frames.append((off, size))

    walk_list(12, len(content))
    if width is None or not frames:
        raise ValueError("AVI container missing avih header or frames")
    return {
        "width": width,
        "height": height,
        "fps": fps or 10,
        "n_frames": len(frames),
        "codec": codec,
        "frame_offsets": frames,
    }


def decode_frame(content: bytes, idx: int, info: dict | None = None) -> np.ndarray:
    """-> HxWx3 uint8 RGB array for frame idx."""
    info = info or parse_avi(content)
    off, size = info["frame_offsets"][idx]
    if info.get("codec") == "MJPG":
        from nexus_forge_spark.functions.jpegcodec import decode_baseline_jpeg

        arr = decode_baseline_jpeg(bytes(content[off : off + size]))
        if arr.ndim == 2:  # grayscale JPEG -> replicate channels
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        return arr
    w, h = info["width"], info["height"]
    stride = _row_stride(w)
    if size < stride * h:
        raise ValueError(f"frame {idx} truncated: {size} < {stride * h}")
    raw = np.frombuffer(content, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up BGR -> top-down RGB


def iter_frames(content: bytes):
    info = parse_avi(content)
    for i in range(info["n_frames"]):
        yield decode_frame(content, i, info)


def video_dhash(content: bytes) -> int:
    """64-bit perceptual video fingerprint: the per-frame image dHash
    (imagecodec.image_dhash — luma 9x8 gradient signs) is computed for
    EVERY decoded frame and the bits are combined by strict majority
    (bit set iff >half the frames set it), so the hash tracks the
    dominant spatial structure across time — stable under re-encoding
    (uncompressed DIB vs Motion-JPEG of the same frames) and frame-count
    padding, unlike byte hashes.  Ties (exactly half) clear the bit —
    deterministic under any frame order since majority counting is
    order-free.  Returns a SIGNED 64-bit int for LongType storage;
    compare with dedup.hamming_pairs.
    """
    from nexus_forge_spark.functions import imagecodec

    counts = [0] * 64
    n = 0
    for frame in iter_frames(content):
        h = imagecodec.image_dhash(frame) & ((1 << 64) - 1)
        for b in range(64):
            counts[b] += (h >> b) & 1
        n += 1
    if n == 0:
        raise ValueError("no decodable frames")
    bits = 0
    for b in range(64):
        if counts[b] * 2 > n:
            bits |= 1 << b
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits
