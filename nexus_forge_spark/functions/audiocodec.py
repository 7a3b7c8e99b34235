"""Pure-numpy WAV (RIFF PCM / IEEE-float) codec + audio features.

Reference analogue: nexus-forge stores media as file distributions and
leaves decoding to consumers (kgforge/specializations/resources/datasets.py
add_distribution); a training-data pipeline needs the decode + feature
stage itself.  No audio library exists in this container, but WAV is a
trivial RIFF container — a struct/numpy parser makes the audio modality
REAL (like the PPM/PGM/BMP/PNG image path in imagecodec.py), while
compressed formats (mp3/ogg/aac) stay stubbed behind the sniff.

Supported: mono/multi-channel, PCM 8-bit unsigned / 16-bit / 32-bit signed,
IEEE float32/float64, arbitrary chunk order.  Decoded samples normalize to
float32 in [-1, 1], shape (n_samples, n_channels).
"""

from __future__ import annotations

import struct

import numpy as np


class AudioDecodeError(ValueError):
    pass


def sniff_wav(content: bytes) -> bool:
    return len(content) >= 12 and content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (n, channels), rate)."""
    buf = bytes(content)
    if not sniff_wav(buf):
        raise AudioDecodeError("not a RIFF/WAVE payload")
    pos, n = 12, len(buf)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise AudioDecodeError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise AudioDecodeError("missing fmt or data chunk")
    audio_format, channels, rate, _byte_rate, _block_align, bits = fmt
    if channels < 1:
        raise AudioDecodeError("zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
            arr = (arr - 128.0) / 128.0
        elif bits == 16:
            arr = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            arr = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise AudioDecodeError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            arr = np.frombuffer(data, dtype="<f4").astype(np.float32)
        elif bits == 64:
            arr = np.frombuffer(data, dtype="<f8").astype(np.float32)
        else:
            raise AudioDecodeError(f"unsupported float bit depth {bits}")
    else:
        raise AudioDecodeError(f"unsupported WAV format code {audio_format}")
    usable = (len(arr) // channels) * channels
    return arr[:usable].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) float in [-1, 1] -> PCM16 WAV bytes (the
    fixture/round-trip encoder for the decoder above)."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    channels = a.shape[1]
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------- features


def rms_energy(samples: np.ndarray) -> float:
    """Root-mean-square amplitude over all channels."""
    return float(np.sqrt(np.mean(np.square(samples, dtype=np.float64))))


def zero_crossing_rate(samples: np.ndarray) -> float:
    """Fraction of consecutive mono-mix sample pairs with a sign change —
    a crude pitch/noisiness proxy."""
    mono = samples.mean(axis=1)
    if len(mono) < 2:
        return 0.0
    signs = np.signbit(mono)
    return float(np.mean(signs[1:] != signs[:-1]))


def spectral_centroid(samples: np.ndarray, rate: int) -> float:
    """Magnitude-weighted mean frequency (Hz) of the mono mix (rfft)."""
    mono = samples.mean(axis=1)
    if len(mono) < 2:
        return 0.0
    mags = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(len(mono), d=1.0 / rate)
    total = mags.sum()
    if total == 0:
        return 0.0
    return float((mags * freqs).sum() / total)
