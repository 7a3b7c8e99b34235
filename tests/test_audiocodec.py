"""Pure-numpy WAV codec: round-trip, format coverage, feature sanity."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from nexus_forge_spark.functions import audiocodec as AC


def _sine(freq: float, rate: int = 16000, seconds: float = 0.1) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * math.pi * freq * t).astype(np.float32)


def test_roundtrip_mono():
    sig = _sine(440.0)
    arr, rate = AC.decode_wav(AC.encode_wav(sig, 16000))
    assert rate == 16000
    assert arr.shape == (len(sig), 1)
    assert np.allclose(arr[:, 0], sig, atol=1.5 / 32768)


def test_roundtrip_stereo():
    sig = np.stack([_sine(440.0), _sine(880.0)], axis=1)
    arr, rate = AC.decode_wav(AC.encode_wav(sig, 8000))
    assert rate == 8000
    assert arr.shape == sig.shape
    assert np.allclose(arr, sig, atol=1.5 / 32768)


def test_float32_and_8bit_formats():
    sig = _sine(100.0, seconds=0.01)
    # IEEE float32 WAV built by hand
    data = sig.astype("<f4").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    arr, _ = AC.decode_wav(buf)
    assert np.allclose(arr[:, 0], sig, atol=1e-6)
    # unsigned 8-bit PCM
    pcm8 = np.round(np.clip(sig, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(pcm8)) + pcm8
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    arr, _ = AC.decode_wav(buf)
    # 8-bit headroom: 127-vs-128 encode/decode scale mismatch (~0.8% of
    # amplitude) + half-step quantization
    assert np.allclose(arr[:, 0], sig, atol=0.02)


def test_bad_payloads_raise():
    with pytest.raises(AC.AudioDecodeError):
        AC.decode_wav(b"nope")
    # RIFF/WAVE but no chunks
    with pytest.raises(AC.AudioDecodeError):
        AC.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    # unsupported compression code
    fmt = struct.pack("<HHIIHH", 85, 1, 16000, 16000, 1, 16)  # mp3-ish
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 0) + b""
    with pytest.raises(AC.AudioDecodeError):
        AC.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_feature_sanity():
    """A 440 Hz sine: RMS ~ 1/sqrt(2), ZCR ~ 2f/rate, centroid ~ 440 Hz."""
    sig = _sine(440.0, rate=16000, seconds=0.5)
    arr, rate = AC.decode_wav(AC.encode_wav(sig, 16000))
    assert abs(AC.rms_energy(arr) - 1 / math.sqrt(2)) < 0.01
    assert abs(AC.zero_crossing_rate(arr) - 2 * 440 / 16000) < 0.005
    assert abs(AC.spectral_centroid(arr, rate) - 440.0) < 15.0


def test_silence_features():
    arr = np.zeros((100, 1), dtype=np.float32)
    assert AC.rms_energy(arr) == 0.0
    assert AC.zero_crossing_rate(arr) == 0.0
    assert AC.spectral_centroid(arr, 16000) == 0.0


def test_adpcm_roundtrip_tolerance():
    t = np.linspace(0, 1, 1000)
    sig = 0.4 * np.sin(2 * np.pi * 30 * t)
    wav = AC.encode_wav_adpcm(sig, rate=8000)
    dec, rate = AC.decode_wav(wav)
    assert rate == 8000 and dec.shape == (1000, 1)
    # 4-bit lossy codec: bound the error, and check the size win
    assert np.abs(dec[:, 0] - sig).mean() < 0.02
    assert len(wav) < len(AC.encode_wav(sig, 8000)) // 3


def test_adpcm_fact_chunk_trims_pad_nibble():
    sig = np.linspace(-0.5, 0.5, 7)  # even nibble count would give 8
    dec, _ = AC.decode_wav(AC.encode_wav_adpcm(sig, rate=8000))
    assert dec.shape == (7, 1)


def test_adpcm_multiblock():
    sig = np.sin(np.linspace(0, 40, 2000)) * 0.6
    wav = AC.encode_wav_adpcm(sig, rate=16000, block_align=64)
    dec, _ = AC.decode_wav(wav)
    assert dec.shape == (2000, 1)
    # block headers resync the predictor: error stays bounded across blocks
    assert np.abs(dec[:, 0] - sig).max() < 0.2


def test_adpcm_rejects_empty():
    with pytest.raises(AC.AudioDecodeError):
        AC.encode_wav_adpcm(np.zeros(0))


def test_audio_energy_hash_gain_invariant_and_discriminative():
    import numpy as np

    from nexus_forge_spark.functions.audiocodec import (
        audio_energy_hash,
        decode_wav,
        encode_wav,
        encode_wav_adpcm,
    )

    rng = np.random.default_rng(11)
    sig = (np.sin(np.linspace(0, 80, 4000)) * np.linspace(0.1, 1, 4000)).astype(
        np.float32
    )
    other = rng.normal(size=4000).astype(np.float32)
    ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
    h = audio_energy_hash(sig)
    # uniform gain scales every window energy equally: gradient signs hold
    assert audio_energy_hash(sig * 0.5) == h
    assert ham(h, audio_energy_hash(other)) > 20  # measured 34
    # PCM16 round-trip is hash-exact; lossy ADPCM flips only borderline
    # gradient bits (measured 9 of 64, vs 34 for an unrelated clip) —
    # the perceptual property byte hashes lack by construction
    pcm, _ = decode_wav(encode_wav(sig))
    assert audio_energy_hash(pcm) == h
    assert ham(h, audio_energy_hash(adp := decode_wav(
        encode_wav_adpcm((sig * 32767).astype(np.int16)))[0])) <= 12


def test_audio_energy_hash_short_input_zero_pads():
    import numpy as np

    from nexus_forge_spark.functions.audiocodec import audio_energy_hash

    assert audio_energy_hash(np.zeros(10, dtype=np.float32)) == 0
    # 3 samples: only the first windows carry energy; must not raise
    assert isinstance(audio_energy_hash(np.array([0.5, -0.25, 0.1])), int)


# ---- round-4: G.711 mu-law / A-law (WAV formats 7 / 6) -------------------


def test_g711_spec_spot_values():
    from nexus_forge_spark.functions import audiocodec as ac

    assert ac._ulaw_decode_byte(0xFF) == 0  # mu-law +0
    assert ac._ulaw_decode_byte(0x7F) == 0  # mu-law -0 collapses to 0
    assert ac._alaw_decode_byte(0xD5) == 8  # A-law smallest positive
    assert ac._alaw_decode_byte(0x55) == -8


def test_g711_tables_self_inverse():
    from nexus_forge_spark.functions import audiocodec as ac

    # A-law: every code round-trips; mu-law: all but the -0 byte (0x7F),
    # which decodes to 0 and re-encodes as +0 (0xFF) per the spec
    assert all(
        ac._alaw_encode_val(ac._alaw_decode_byte(b)) == b for b in range(256)
    )
    bad = [
        b
        for b in range(256)
        if ac._ulaw_encode_val(ac._ulaw_decode_byte(b)) != b
    ]
    assert bad == [0x7F]


def test_g711_wav_roundtrip_and_features():
    import numpy as np

    from nexus_forge_spark.functions import audiocodec as ac

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, 1024)
    for law in ("ulaw", "alaw"):
        wav = ac.encode_wav_g711(x, rate=8000, law=law)
        assert ac.sniff_wav(wav)
        arr, rate = ac.decode_wav(wav)
        assert rate == 8000 and arr.shape == (1024, 1)
        # logarithmic companding: bounded relative error away from zero
        rel = np.abs(arr[:, 0] - x) / np.maximum(np.abs(x), 1e-2)
        assert rel.max() < 0.08
        assert ac.rms_energy(arr[:, 0]) > 0
