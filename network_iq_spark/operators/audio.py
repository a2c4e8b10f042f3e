"""Pure-stdlib WAV (RIFF PCM) codec + integer-exact audio features.

Reference behavior: the reference pipeline treats audio as an opaque
payload handed to a native decoder; this container has no audio libs, so
the uncompressed tier is implemented directly (RIFF chunk walk, PCM 8/16
bit, mono/stereo). Compressed formats (MP3/OGG/FLAC/ADPCM) return
``None`` — the caller falls back to the metadata-only path.

Every feature is INTEGER arithmetic over int16 samples (sum of squares
fits int64 up to ~2^33 samples), so a DuckDB oracle can replay the whole
decode→decimate→re-encode→stats pipeline exactly — the audio sibling of
the constant-block JPEG trick in operators/jpeg.py.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(payload: bytes):
    """WAV bytes → (sample_rate, int16 ndarray of shape (n, channels)),
    or ``None`` for non-PCM / compressed / truncated input."""
    data = bytes(payload)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if cid == b"fmt ":
            if clen < 16:
                return None
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if audio_fmt != 1 or ch not in (1, 2) or bits not in (8, 16):
                return None  # only uncompressed PCM
            fmt = (ch, rate, bits)
        elif cid == b"data":
            if fmt is None:
                return None
            ch, rate, bits = fmt
            if bits == 16:
                n = clen // (2 * ch)
                s = np.frombuffer(body, dtype="<i2", count=n * ch)
            else:  # 8-bit WAV is unsigned, center at 0 and widen
                n = clen // ch
                s = (
                    np.frombuffer(body, dtype=np.uint8, count=n * ch).astype(np.int16)
                    - 128
                )
            samples = s.reshape(n, ch)
        pos += 8 + clen + (clen & 1)  # chunks pad to even length
    if fmt is None or samples is None:
        return None
    return fmt[1], samples


def encode_wav(samples, sample_rate: int) -> bytes:
    """int16 ndarray (n,) or (n, channels) → 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    body = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def decimate(samples, factor: int):
    """Every ``factor``-th sample starting at 0 — the deterministic
    integer downsample (no filter, so both engines agree on WHICH samples
    survive; an anti-aliasing filter would be float-order-dependent)."""
    return np.asarray(samples)[::factor]


def audio_stats(samples) -> dict:
    """Integer-exact features over an int16 (n,) or (n, ch) array:
    n_samples, peak = max |s|, sumsq = Σ s² (int64), zero_crossings =
    #{i>0 : sign(s_i) ≠ sign(s_{i-1})} with sign(0) = +1, over channel 0."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 2:
        s = s[:, 0]
    sign = np.where(s < 0, -1, 1)
    return {
        "n_samples": int(s.shape[0]),
        "peak": int(np.abs(s).max()) if s.size else 0,
        "sumsq": int((s * s).sum()),
        "zero_crossings": int((sign[1:] != sign[:-1]).sum()) if s.size else 0,
    }
