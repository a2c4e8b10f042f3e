"""Pure-stdlib GIF codec (LZW) — multimodal tier, real-format coverage.

Reference behavior: the reference renders images in the browser
(streamlit_app.py) and ships no codec; crawled corpora carry GIFs, so the
decode tier implements the format directly from the GIF89a specification:
logical screen descriptor, global/local color tables, variable-width LZW
with CLEAR/EOI handling and the deferred-clear growth schedule, interlace
(the four-pass row order), and sub-block framing. Animations decode to
the FIRST frame (the feature-extraction convention); transparency is
ignored (the palette color is returned). Anything outside the subset —
truncated streams, torn sub-blocks, missing palettes — returns ``None``:
corrupt bytes quarantine, never raise and never allocate past the
declared-dimension cap (same contract as operators/jpeg.py).

GIF is LOSSLESS, so the oracle story needs no constant-block trick: any
palette image round-trips bit-exactly, and the DuckDB twin of a decode
query replays pixels directly (queries/media.py ``decoded_gif_stats``).

The encoder emits spec-valid GIF89a with an exact LZW literal coder that
mirrors the decoder's width/CLEAR schedule — fixtures are built in-plan,
no binary files shipped.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_PIXELS = 1 << 26  # declared-dimension allocation cap (see jpeg.py)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _LZWReader:
    """Little-endian variable-width code reader over concatenated
    sub-block payloads."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int | None:
        while self.n < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.n
            self.n += 8
            self.pos += 1
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytearray | None:
    """GIF LZW → index stream of exactly ``n_pixels`` entries, or None."""
    if not 2 <= min_code <= 11:
        return None
    clear = 1 << min_code
    eoi = clear + 1
    reader = _LZWReader(data)
    out = bytearray()

    def reset():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code is None:
            return None
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # growth schedule: width bumps when the NEXT append would not fit,
        # capped at 12 bits (further codes reuse the full table until CLEAR)
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out[:n_pixels] if len(out) >= n_pixels else None


class _LZWWriter:
    """Literal-only LZW coder that mirrors the decoder's width/CLEAR
    schedule exactly: each emitted literal appends one (unused) table
    entry on the decode side, so the encoder tracks that phantom table
    to bump widths at the same codes and CLEARs before the 12-bit cap."""

    def __init__(self, min_code: int) -> None:
        self.min_code = min_code
        self.clear = 1 << min_code
        self.out = bytearray()
        self.acc = 0
        self.n = 0
        self._reset_counters()
        self._emit(self.clear)

    def _reset_counters(self) -> None:
        self.width = self.min_code + 1
        self.size = self.clear + 2

    def _emit(self, code: int) -> None:
        self.acc |= code << self.n
        self.n += self.width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def literal(self, idx: int) -> None:
        if self.size >= (1 << 12) - 1:
            self._emit(self.clear)
            self._reset_counters()
            self.first = True
        self._emit(idx)
        if getattr(self, "first", True):
            self.first = False  # first code after CLEAR adds no entry
        else:
            self.size += 1
            if self.size >= (1 << self.width) and self.width < 12:
                self.width += 1

    def finish(self) -> bytes:
        self._emit(self.clear + 1)  # EOI
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes):
    """GIF bytes → uint8 H×W×3 RGB (first frame), or ``None``."""
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    sw, sh, packed, _bg, _par = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            return None
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return None  # no image block seen
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            return None
        if pos + 10 > len(data):
            return None
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if w == 0 or h == 0 or w * h > _MAX_PIXELS:
            return None
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                return None
            pal = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            return None
        if pos >= len(data):
            return None
        min_code = data[pos]
        pos += 1
        chunks = bytearray()
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            if pos + 1 + ln > len(data):
                return None
            chunks += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        if pos >= len(data):
            return None
        idx = _lzw_decode(bytes(chunks), min_code, w * h)
        if idx is None:
            return None
        arr = np.frombuffer(bytes(idx), np.uint8).copy()
        if arr.max(initial=0) >= len(pal):
            return None
        rows = arr.reshape(h, w)
        if ipacked & 0x40:  # interlace: rows arrive in four passes
            out = np.zeros_like(rows)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for y in range(start, h, step):
                    out[y] = rows[src]
                    src += 1
            rows = out
        return pal[rows]  # (h, w, 3) uint8
    return None


def encode_gif(img, interlace: bool = False) -> bytes:
    """uint8 H×W×3 RGB (≤256 distinct colors) or H×W gray → GIF89a
    bytes. Lossless: ``decode_gif(encode_gif(x))`` is bit-identical,
    which is the whole oracle story for the decode query."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    flat = img.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs a <=256-color image")
    bits = max(2, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    rows = idx.reshape(h, w)
    if interlace:
        order = [
            y for start, step in _INTERLACE_PASSES for y in range(start, h, step)
        ]
        rows = rows[order]
    wtr = _LZWWriter(bits)
    for v in rows.reshape(-1):
        wtr.literal(int(v))
    lzw = wtr.finish()
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07) << 4 | (bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([bits])
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        out += bytes([len(part)]) + part
    out += b"\x00\x3B"
    return bytes(out)
