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
    fact_samples = None
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
        elif cid == b"fact" and len(body) >= 4:
            fact_samples = struct.unpack_from("<I", body, 0)[0]
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
    elif audio_format in (6, 7):  # G.711 A-law / mu-law, 8 bit/sample
        table = _ULAW_TABLE if audio_format == 7 else _ALAW_TABLE
        pcm16 = table[np.frombuffer(data, dtype=np.uint8)]
        arr = pcm16.astype(np.float32) / 32768.0
    elif audio_format == 0x11:  # IMA/DVI ADPCM (compressed, 4 bit/sample)
        if channels != 1:
            raise AudioDecodeError("IMA ADPCM decode supports mono only")
        if _block_align < 4:
            raise AudioDecodeError("ADPCM block_align < 4")
        pcm: list[int] = []
        for boff in range(0, len(data), _block_align):
            block = data[boff : boff + _block_align]
            if len(block) < 4:
                break
            (pred,) = struct.unpack_from("<h", block, 0)
            index = block[2]
            if index > 88:
                raise AudioDecodeError(f"ADPCM step index {index} > 88")
            pcm.extend(_adpcm_decode_block(block[4:], pred, index))
        if fact_samples is not None:
            pcm = pcm[:fact_samples]  # drop pad-nibble samples
        arr = np.asarray(pcm, dtype=np.float32) / 32768.0
        return arr.reshape(-1, 1), rate
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


# ---------------------------------------------------- IMA ADPCM (public spec)
# Standard IMA/DVI tables (IMA Digital Audio Pack, 1992; also RFC 3551 app.)
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8] * 2
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _adpcm_step(nib: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM reconstruction step (shared by encode + decode so the
    encoder's predictor tracks the decoder exactly)."""
    step = _IMA_STEPS[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    predictor = predictor - diff if nib & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX[nib]))
    return predictor, index


def _adpcm_decode_block(payload: bytes, predictor: int, index: int) -> list[int]:
    out = [predictor]
    for byte in payload:
        for nib in (byte & 0xF, byte >> 4):
            predictor, index = _adpcm_step(nib, predictor, index)
            out.append(predictor)
    return out


def encode_wav_adpcm(
    samples: np.ndarray, rate: int = 16000, block_align: int = 256
) -> bytes:
    """Mono float [-1, 1] -> IMA ADPCM WAV bytes (format tag 0x11): 4 bits
    per sample after the first, ~4:1 over PCM16.  Block = 4-byte header
    (predictor int16, step index, reserved) + packed nibbles, low first."""
    a = np.asarray(samples, dtype=np.float64).reshape(-1)
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype(np.int64)
    if len(pcm) == 0:
        raise AudioDecodeError("encode_wav_adpcm needs at least one sample")
    spb = (block_align - 4) * 2 + 1  # samples per full block
    blocks = []
    for boff in range(0, len(pcm), spb):
        chunk = pcm[boff : boff + spb]
        predictor, index = int(chunk[0]), 0
        nibbles: list[int] = []
        for s in chunk[1:]:
            step = _IMA_STEPS[index]
            diff = int(s) - predictor
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            predictor, index = _adpcm_step(nib, predictor, index)
            nibbles.append(nib)
        if len(nibbles) % 2:
            nibbles.append(0)  # pad nibble (decoder trims via fact chunk)
        payload = bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        blocks.append(struct.pack("<hBB", int(chunk[0]), 0, 0) + payload)
    data = b"".join(blocks)
    spb_actual = min(spb, len(pcm))
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4, 2, spb_actual
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(pcm))
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


def audio_energy_hash(samples: np.ndarray) -> int:
    """64-bit perceptual audio fingerprint — the audio analogue of
    imagecodec.image_dhash: the mono mix is split into 65 equal time
    windows and each bit records whether mean energy RISES between
    consecutive windows.  Gradient signs survive uniform gain changes,
    resampling, and lossy re-encoding (ADPCM round-trips) that break
    exact byte hashes.  Returns a SIGNED 64-bit int (two's complement
    wrap) for direct LongType storage; compare with bit_count(a XOR b)
    via dedup.hamming_pairs.
    """
    mono = samples.mean(axis=1) if samples.ndim > 1 else samples
    mono = np.asarray(mono, dtype=np.float64)
    if mono.size < 65:
        mono = np.pad(mono, (0, 65 - mono.size))
    windows = np.array_split(mono, 65)
    energy = np.array([float(np.mean(w * w)) for w in windows])
    bits = 0
    for i in range(64):
        bits = (bits << 1) | (1 if energy[i + 1] > energy[i] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


# ------------------------------------------------ G.711 mu-law / A-law
# ITU-T G.711 (1972/1988) companded telephony audio — WAV format codes 6
# (A-law) and 7 (mu-law), 8 bits/sample.  Decode tables are derived from
# the published segment algorithms; spot values pinned in tests against
# the spec tables (mu 0xFF -> 0, A 0xD5 -> +8).


def _ulaw_decode_byte(b: int) -> int:
    b = ~b & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 7
    mant = b & 0x0F
    s = (((mant << 3) + 0x84) << exp) - 0x84
    return -s if sign else s


def _alaw_decode_byte(b: int) -> int:
    a = b ^ 0x55
    sign = a & 0x80
    seg = (a >> 4) & 7
    t = ((a & 0x0F) << 4) + 8
    if seg:
        t = (t + 0x100) << (seg - 1)
    return t if sign else -t


_ULAW_TABLE = np.asarray([_ulaw_decode_byte(b) for b in range(256)], "<i2")
_ALAW_TABLE = np.asarray([_alaw_decode_byte(b) for b in range(256)], "<i2")


def _ulaw_encode_val(s: int) -> int:
    sign = 0x80 if s < 0 else 0
    s = min(abs(s), 32635) + 0x84
    exp = s.bit_length() - 8  # s >= 0x84 -> bit_length >= 8
    mant = (s >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def _alaw_encode_val(s: int) -> int:
    sign = 0x80 if s >= 0 else 0
    s = min(abs(s), 32767)
    if s < 256:
        out = s >> 4
    else:
        seg = s.bit_length() - 8
        out = (seg << 4) | ((s >> (seg + 3)) & 0x0F)
    return (sign | out) ^ 0x55


def encode_wav_g711(
    samples: np.ndarray, rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """(n,) float in [-1, 1] -> mono G.711 WAV bytes (format code 7 for
    mu-law, 6 for A-law) — the fixture encoder for the decoder below."""
    a = np.asarray(samples, dtype=np.float64).reshape(-1)
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype(np.int64)
    enc = _ulaw_encode_val if law == "ulaw" else _alaw_encode_val
    data = bytes(enc(int(v)) for v in pcm)
    code = 7 if law == "ulaw" else 6
    fmt = struct.pack("<HHIIHH", code, 1, rate, rate, 1, 8)
    fact = struct.pack("<I", len(data))
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
