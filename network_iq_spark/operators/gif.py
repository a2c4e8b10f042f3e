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


def _extract_run(
    b24: np.ndarray, total_bits: int, bitpos: int, min_code: int
) -> tuple[np.ndarray, int, str]:
    """Burst-extract one CLEAR-delimited run of variable-width LZW codes.

    Between CLEARs the width schedule is DETERMINISTIC: the table grows
    by exactly one entry per consumed code (none for the first), so the
    code index at which the width bumps is a closed form of ``clear``
    alone — width w covers run indices up to ``(1 << w) - clear - 2``,
    capped at 12 bits. That turns the per-code bit reader into a handful
    of numpy gathers (one per width band): code j's 19-bit window is
    ``b24[bit >> 3] >> (bit & 7)``. Returns (codes before the break, bit
    position after the break code, break kind ∈ {clear, eoi, end})."""
    clear = 1 << min_code
    eoi = clear + 1
    parts: list[np.ndarray] = []
    w = min_code + 1
    j0 = 0  # code index within this run
    while True:
        band = ((1 << w) - clear - 1 - j0) if w < 12 else None  # codes left at w
        ncap = (total_bits - bitpos) // w  # codes readable before stream end
        n = ncap if band is None else min(ncap, band)
        if n > 0:
            offs = bitpos + w * np.arange(n, dtype=np.int64)
            vals = (
                (b24[offs >> 3] >> (offs & 7).astype(np.uint32))
                & np.uint32((1 << w) - 1)
            ).astype(np.int64)
            hit = np.nonzero((vals == clear) | (vals == eoi))[0]
            if hit.size:
                k = int(hit[0])
                parts.append(vals[:k])
                kind = "eoi" if int(vals[k]) == eoi else "clear"
                codes = np.concatenate(parts) if parts else vals[:0]
                return codes, int(offs[k]) + w, kind
            parts.append(vals)
            bitpos += w * n
            j0 += n
        if band is not None and n == band:
            w += 1
            continue
        codes = (
            np.concatenate(parts) if parts else np.zeros(0, np.int64)
        )
        return codes, bitpos, "end"


def _decode_run(
    codes: np.ndarray, clear: int, needed: int
) -> tuple[np.ndarray | None, bool]:
    """Expand one run of LZW codes (no CLEAR/EOI inside) to its index
    stream, vectorized. Returns (chars, ok); chars is None when an
    invalid code appears before ``needed`` chars are produced (the
    scalar contract: corrupt → None), ok=False only in that case.

    The sequential table is never materialized. Entry ``base + k - 1``
    (created at step k) is string(step k-1) + F[k], where F[i] is the
    first char of step i's string — so F and each step's LENGTH follow
    one parent chain par[i] = codes[i] - base (literal steps are roots),
    resolved in O(log depth) pointer-doubling passes. Content then fills
    by noting every output position is either a directly-known char
    (literal, or an entry's last char F[par+1]) or a COPY of a strictly
    earlier position (entry prefix = parent string), so a second
    pointer-doubling over positions lands every copy on a known char.
    The KwKwK case needs no branch: codes[i] == base + i - 1 gives
    par[i] = i - 1, and both recurrences already agree there."""
    m = int(codes.size)
    if m == 0:
        return np.zeros(0, np.uint8), True
    base = clear + 2
    idx = np.arange(m, dtype=np.int64)
    is_lit = codes < clear
    par = np.where(is_lit, np.int64(-1), codes - base)
    # valid: literal, or an entry existing at read time (KwKwK included:
    # par == i - 1); codes in [clear, base) were split out by extraction
    bad = np.nonzero(~(is_lit | (par <= idx - 1)))[0]
    v = int(bad[0]) if bad.size else m
    if v == 0:
        return None, False
    parv = par[:v]
    # --- pass 1: root (first-char literal step) + depth per step -------
    nxt = np.where(parv >= 0, parv, idx[:v])
    dist = (parv >= 0).astype(np.int64)
    while True:
        n2 = nxt[nxt]
        moved = n2 != nxt
        if not moved.any():
            break
        dist = dist + np.where(moved, dist[nxt], 0)
        nxt = np.where(moved, n2, nxt)
    first = codes[:v][nxt]  # F[i]: first char of step i's string
    lengths = dist + 1
    csum = np.cumsum(lengths)
    stop = int(np.searchsorted(csum, needed, side="left"))
    if stop >= v and v < m:
        return None, False  # hit the invalid code while still short
    k = min(stop + 1, v)  # steps actually consumed (scalar stops here too)
    lk, endk = lengths[:k], csum[:k]
    offk = endk - lk
    n = int(endk[-1])
    pk, ck = parv[:k], codes[:k]
    # --- pass 2: fill known chars, route copies, resolve ----------------
    val = np.zeros(n, np.int64)
    src = np.full(n, -1, np.int64)
    lit = pk < 0
    val[offk[lit]] = ck[lit]
    ent = ~lit
    if ent.any():
        val[endk[ent] - 1] = first[pk[ent] + 1]  # entry's last char
        cnt = lk[ent] - 1  # inner chars = parent string, copied by position
        tot = int(cnt.sum())
        if tot:
            r = np.arange(tot, dtype=np.int64) - np.repeat(
                np.cumsum(cnt) - cnt, cnt
            )
            src[np.repeat(offk[ent], cnt) + r] = np.repeat(offk[pk[ent]], cnt) + r
    while True:
        t = src[np.maximum(src, 0)]
        upd = (src >= 0) & (t >= 0)
        if not upd.any():
            break
        src = np.where(upd, t, src)
    copy = src >= 0
    if copy.any():
        val[copy] = val[src[copy]]
    return val.astype(np.uint8), True


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> bytearray | None:
    """GIF LZW → index stream of exactly ``n_pixels`` entries, or None.

    Vectorized (r11, VERDICT item 3): the per-code Python loop was the
    suite's most expensive constant (decoded_gif_stats 6.79 s). Codes are
    burst-extracted per width band (:func:`_extract_run`) and expanded by
    two pointer-doubling passes (:func:`_decode_run`) — O(n log depth)
    numpy work, no per-byte interpretation. Bit-identical to the scalar
    reference kept in tests/test_gif.py (differential-fuzzed there).

    ``min_code`` is capped at 8 per the GIF89a spec (the initial code
    size is the palette bit depth, 2–8); the old 11 cap was a latent
    crash — a corrupt 9–11 value built literal table entries > 255."""
    if not 2 <= min_code <= 8:
        return None
    clear = 1 << min_code
    d = np.frombuffer(bytes(data), np.uint8)
    total_bits = 8 * int(d.size)
    pad = np.zeros(d.size + 2, np.uint32)
    pad[: d.size] = d
    b24 = pad[:-2] | (pad[1:-1] << 8) | (pad[2:] << 16)
    out_parts: list[np.ndarray] = []
    produced = 0
    bitpos = 0
    while produced < n_pixels:
        codes, bitpos, brk = _extract_run(b24, total_bits, bitpos, min_code)
        seg, ok = _decode_run(codes, clear, n_pixels - produced)
        if not ok:
            return None
        if seg.size:
            out_parts.append(seg)
            produced += int(seg.size)
        if produced >= n_pixels:
            break
        if brk != "clear":  # eoi → short output; end → reader exhausted
            return None
    out = np.concatenate(out_parts) if out_parts else np.zeros(0, np.uint8)
    return bytearray(out[:n_pixels].tobytes())


def _literal_widths(m: int, min_code: int) -> np.ndarray:
    """Code widths for m consecutive literals after a CLEAR — the same
    deterministic schedule :func:`_extract_run` reads by: each literal
    after the first appends one (unused) table entry on the decode side,
    so the width while emitting literal j is governed by table size
    clear+1+j, capped at 12 bits."""
    clear = 1 << min_code
    w0 = min_code + 1
    width = np.full(m, w0, np.int64)
    if m > 1:
        t = (clear + 1 + np.arange(1, m)).astype(np.float64)
        bl = np.frexp(t)[1]  # exact bit_length for ints < 2^53
        width[1:] = np.minimum(12, np.maximum(w0, bl))
    return width


def _lzw_encode_literals(idxs: np.ndarray, min_code: int) -> bytes:
    """Literal-only LZW coder, vectorized (r11) — mirrors the decoder's
    width/CLEAR schedule exactly: CLEAR first, a forced CLEAR before the
    phantom table reaches the 12-bit cap (every 4094−clear literals),
    EOI last. Widths per literal are the closed-form band schedule, so
    the whole stream packs in one numpy pass: code c at bit offset b
    contributes ``c << (b & 7)`` to bytes b>>3..b>>3+2, and because code
    bit-ranges are disjoint, scatter-ADD equals OR. Bit-identical to the
    scalar writer kept in tests/test_gif.py (differential-fuzzed)."""
    clear = 1 << min_code
    eoi = clear + 1
    w0 = min_code + 1
    block = 4094 - clear  # literals between forced CLEARs
    idxs = np.asarray(idxs, dtype=np.int64).reshape(-1)
    n = int(idxs.size)
    parts_c: list[np.ndarray] = [np.array([clear], np.int64)]
    parts_w: list[np.ndarray] = [np.array([w0], np.int64)]
    pos = 0
    m = 0
    while True:
        m = min(block, n - pos)
        parts_c.append(idxs[pos : pos + m])
        parts_w.append(_literal_widths(m, min_code))
        pos += m
        if pos >= n:
            break
        # forced CLEAR: by block end the width has reached 12
        parts_c.append(np.array([clear], np.int64))
        parts_w.append(np.array([12], np.int64))
    if m <= 1:
        eoi_w = w0  # ≤1 literal since the last CLEAR: no width bump yet
    else:
        eoi_w = min(12, max(w0, int(clear + 1 + m).bit_length()))
    parts_c.append(np.array([eoi], np.int64))
    parts_w.append(np.array([eoi_w], np.int64))
    codes = np.concatenate(parts_c)
    widths = np.concatenate(parts_w)
    ends = np.cumsum(widths)
    boffs = ends - widths
    total_bits = int(ends[-1])
    nbytes = (total_bits + 7) >> 3
    v = codes.astype(np.uint32) << (boffs & 7).astype(np.uint32)
    byte = (boffs >> 3).astype(np.int64)
    out = np.zeros(nbytes + 2, np.uint32)
    np.add.at(out, byte, v & 0xFF)
    np.add.at(out, byte + 1, (v >> 8) & 0xFF)
    np.add.at(out, byte + 2, (v >> 16) & 0xFF)
    return out[:nbytes].astype(np.uint8).tobytes()


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
    flat = img.reshape(-1, 3).astype(np.uint32)
    # pack RGB into one uint32: numeric order of (r<<16 | g<<8 | b) IS the
    # lexicographic row order np.unique(axis=0) used, so the palette (and
    # hence the bytes) are identical — but 1-D unique skips the void-view
    # argsort that dominated the encode profile (r11)
    packed = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    pcol, idx = np.unique(packed, return_inverse=True)
    colors = np.stack(
        [(pcol >> 16) & 255, (pcol >> 8) & 255, pcol & 255], axis=-1
    ).astype(np.uint8)
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
    lzw = _lzw_encode_literals(rows.reshape(-1), bits)
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
