"""WAV codec + integer-exact audio features (operators/audio.py)."""

from __future__ import annotations

import struct

import numpy as np

from network_iq_spark.operators.audio import (
    audio_stats,
    decimate,
    decode_wav,
    encode_wav,
)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(21)
    mono = rng.integers(-32768, 32768, size=100, dtype=np.int16)
    rate, got = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and got.shape == (100, 1)
    assert (got[:, 0] == mono).all()

    stereo = rng.integers(-32768, 32768, size=(50, 2), dtype=np.int16)
    rate, got = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and got.shape == (50, 2)
    assert (got == stereo).all()


def test_wav_8bit_decodes_centered():
    """8-bit WAV is unsigned; the decoder re-centers at 0."""
    body = bytes([0, 128, 255, 200])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    rate, got = decode_wav(wav)
    assert rate == 8000
    assert got[:, 0].tolist() == [-128, 0, 127, 72]


def test_wav_odd_length_chunk_padding():
    """RIFF chunks pad to even byte length — a decoder that forgets the
    pad byte misreads every chunk after an odd-sized one."""
    # odd-length junk chunk before data
    samples = np.array([1, -2, 3], dtype=np.int16)
    good = encode_wav(samples, 8000)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    patched = good[:12] + junk + good[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, got = decode_wav(patched)
    assert rate == 8000 and (got[:, 0] == samples).all()


def test_wav_rejects_compressed_truncated_garbage():
    samples = np.arange(-5, 5, dtype=np.int16)
    good = encode_wav(samples, 8000)
    assert decode_wav(b"") is None
    assert decode_wav(b"RIFFxxxxWAVE") is None
    assert decode_wav(good[:30]) is None  # truncated data chunk
    # flip audio format to 2 (ADPCM) -> unsupported
    bad = bytearray(good)
    bad[20] = 2
    assert decode_wav(bytes(bad)) is None


def test_audio_stats_integer_exact():
    s = np.array([3, -1, 0, 0, -2, 5], dtype=np.int16)
    st = audio_stats(s)
    assert st["n_samples"] == 6
    assert st["peak"] == 5
    assert st["sumsq"] == 9 + 1 + 0 + 0 + 4 + 25
    # signs: + - + + - +  -> transitions at 1,2,4,5
    assert st["zero_crossings"] == 4
    # decimation picks indices 0,2,4
    assert decimate(s, 2).tolist() == [3, 0, -2]
