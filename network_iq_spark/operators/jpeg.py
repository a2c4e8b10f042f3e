"""Pure-numpy baseline JPEG codec (SURVEY.md §7 F, multimodal tier).

Reference behavior: the reference pipeline hands image bytes to a native
codec; this container has none, so the baseline-DCT path is implemented
directly from the JPEG spec (ITU-T T.81): marker parse, canonical Huffman
decode, dequantize, de-zigzag, float64 IDCT, level shift. Supported:
8-bit baseline sequential, 1-component grayscale and 3-component YCbCr
with sampling factors 1 or 2 per axis — 4:4:4, 4:2:2, and 4:2:0 (the
dominant format of real crawled corpora; chroma planes decode at their
own resolution per the interleaved-MCU order of §A.2.3 and upsample by
sample replication before the color transform), with restart markers —
in BOTH baseline-sequential (SOF0) and progressive (SOF2, Annex G:
spectral selection, successive approximation, EOB runs) modes, which
share one multi-scan coefficient-accumulation core. Arithmetic coding,
12-bit, lossless/hierarchical, and sampling factors >2 return ``None``
— the caller falls back to the metadata-only path, never garbage pixels.

The encoders exist so the distributed pipeline can be exercised end to
end on REAL JPEG bytes without shipping binary fixtures: they emit
spec-valid baseline and progressive files (Annex K quantization + Huffman
tables work everywhere). Constant 8×8 blocks survive the DCT→quantize→dequantize→IDCT
round trip bit-exactly (only the DC coefficient is nonzero and it is
quantized with step 1), which is what makes an integer-exact DuckDB
oracle possible for a lossy codec — see queries/media.py
``decoded_jpeg_stats``.
"""

from __future__ import annotations

import array as _array
import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# Decode-side allocation cap (pixels per frame). Headers are attacker- or
# corruption-controlled; every allocation must be bounded by this, never
# by a declared dimension alone. 2^26 = 64 Mpixel ≈ a 8192x8192 frame.
_MAX_PIXELS = 1 << 26


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix (float64)."""
    C = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            C[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16.0)
    C *= 0.5
    C[0, :] *= 1.0 / np.sqrt(2.0)
    return C


_DCT = _dct_matrix()


def _canonical_codes(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int] | None:
    """(length, code) → symbol map from a DHT (bits, values) spec, or
    None for an oversubscribed spec (Kraft sum > 1). Headers are
    attacker-controlled: an oversubscribed DHT would assign overlapping
    code ranges, and the 16-bit full-lookahead LUT fills those ranges
    last-writer-wins while the bitwise dict walk matches first-defined —
    the two decode paths would silently diverge on exactly such a
    stream (r12 ADVICE). Rejecting the spec keeps LUT and bitwise
    semantics identical on ALL inputs; prefix-freeness of every
    accepted table is then guaranteed by construction."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if code + bits[length - 1] > (1 << length):
            return None  # more codes than the level has slots
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable(dict):
    """Canonical-Huffman decode table: the (length, code) → symbol dict
    plus a lazily-built 16-bit full-lookahead LUT (r12, VERDICT item 4 —
    the entropy-decode fast path): ``lut[peek16] = (symbol << 5) | code
    length``, 0 for prefixes that match no code. Prefix-freeness makes
    the LUT exact — one lookup replaces the up-to-16-iteration
    bit-by-bit walk (the libjpeg lookahead idea, taken to full code
    depth so there is no slow path at all)."""

    __slots__ = ("_lut",)

    def __init__(self, codes: dict[tuple[int, int], int]) -> None:
        super().__init__(codes)
        self._lut: "_array.array[int] | None" = None

    @property
    def lut(self) -> "_array.array[int]":
        if self._lut is None:
            lut = np.zeros(1 << 16, dtype=np.uint32)
            for (length, code), sym in self.items():
                lo = code << (16 - length)
                lut[lo : lo + (1 << (16 - length))] = (sym << 5) | length
            # array('I'), not tolist(): 256 KB vs ~2.3 MB of boxed ints
            # per cached table (the DHT cache bound is 64 tables per
            # Python worker), builds 30x faster, and indexes no slower
            self._lut = _array.array("I", lut.tobytes())
        return self._lut


# DHT spec bytes → table. Decoders run per image inside Arrow batches and
# real corpora reuse a handful of table specs (every Annex-K encoder
# ships the same four), so rebuilding dict + LUT per image dominated the
# tiny-image profile (16% dict build alone). Keyed by the raw spec bytes;
# bounded because headers are attacker-controlled — a corpus of
# all-distinct DHTs must not grow driver-side memory without limit.
_DHT_CACHE: dict[bytes, _HuffTable] = {}
_DHT_CACHE_MAX = 64


def _huff_table(bits: list[int], vals: list[int]) -> _HuffTable | None:
    """Build (or fetch) the decode table; None for an invalid spec —
    the caller must then reject the image. Invalid specs are NOT
    cached: a hostile corpus of distinct bad headers must not evict
    the warm Annex-K tables, and re-running the 16-entry capacity
    check per sighting is trivially cheap."""
    key = bytes(bits) + b"\xFF" + bytes(vals)
    tbl = _DHT_CACHE.get(key)
    if tbl is None:
        codes = _canonical_codes(bits, vals)
        if codes is None:
            return None
        if len(_DHT_CACHE) >= _DHT_CACHE_MAX:
            # evict ONE entry (insertion-order FIFO), not the whole dict:
            # a corpus cycling through >64 specs would otherwise thrash —
            # every insert past the 64th discarding all warm Annex-K
            # tables and degrading to per-image rebuilds (r12 ADVICE)
            _DHT_CACHE.pop(next(iter(_DHT_CACHE)))
        tbl = _HuffTable(codes)
        _DHT_CACHE[key] = tbl
    return tbl


_ENC_CACHE: dict[bytes, dict[int, tuple[int, int]]] = {}


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) map (encoder direction); memoized like
    the decode tables — encoders run per image inside Arrow batches and
    always reuse the module's Annex-K specs."""
    key = bytes(bits) + b"\xFF" + bytes(vals)
    out = _ENC_CACHE.get(key)
    if out is None:
        if len(_ENC_CACHE) >= _DHT_CACHE_MAX:
            _ENC_CACHE.pop(next(iter(_ENC_CACHE)))  # single-entry FIFO
        codes = _canonical_codes(bits, vals)
        # encoder specs are module constants (Annex K), never wire input;
        # explicit raise (not assert) so the invariant survives python -O
        if codes is None:
            raise RuntimeError("internal encoder DHT spec oversubscribed")
        out = {v: (c, l) for (l, c), v in codes.items()}
        _ENC_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# Bit IO
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        data, pos = self.data, self.pos
        if pos >= len(data):
            return False
        b = data[pos]
        if b == 0xFF:
            nxt = data[pos + 1] if pos + 1 < len(data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller consumes it
            else:
                self.marker = nxt
                return False
            self.acc = (self.acc << 8) | b
            self.n += 8
            return True
        # bulk path (r12): consume up to 8 plain bytes at once, stopping
        # before the next 0xFF (stuffing/marker candidate) — the
        # one-byte-at-a-time fill was ~30% of tiny-image decode
        chunk = data[pos : pos + 8]
        ff = chunk.find(0xFF)
        k = len(chunk) if ff < 0 else ff
        self.acc = (self.acc << (8 * k)) | int.from_bytes(chunk[:k], "big")
        self.n += 8 * k
        self.pos = pos + k
        return True

    def bits(self, k: int) -> int | None:
        while self.n < k:
            if not self._fill():
                return None
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: _HuffTable) -> int | None:
        """One-lookup Huffman decode against the table's 16-bit LUT
        (r12): peek up to 16 bits (zero-padded past end-of-segment — a
        match longer than the real remaining bits is rejected below,
        which is exactly where the bit-by-bit walk ran dry), consume the
        matched length. Byte-identical to :func:`_huff_bitwise` by
        prefix-freeness — differential-fuzzed in tests/test_jpeg.py."""
        while self.n < 16:
            if not self._fill():
                break
        n = self.n
        peek = (self.acc >> (n - 16)) if n >= 16 else (self.acc << (16 - n))
        lut = table._lut
        if lut is None:
            lut = table.lut
        t = lut[peek & 0xFFFF]
        length = t & 31
        if length == 0 or length > n:
            return None
        self.n = n - length
        self.acc &= (1 << self.n) - 1
        return t >> 5

    def align_and_consume_rst(self) -> bool:
        """Drop partial byte, consume an RSTn marker; False if absent."""
        self.acc = 0
        self.n = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return True
        return False


def _huff_bitwise(r: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    """Pre-r12 bit-by-bit canonical-Huffman walk, kept as the
    differential-fuzz reference for :meth:`_BitReader.huff` (the GIF LZW
    precedent: the scalar original stays testable forever)."""
    code = 0
    for length in range(1, 17):
        b = r.bits(1)
        if b is None:
            return None
        code = (code << 1) | b
        if (length, code) in table:
            return table[(length, code)]
    return None


def _receive_extend(r: _BitReader, size: int) -> int | None:
    if size == 0:
        return 0
    if size > 16:
        # spec max is 11 (8-bit DC diff); a larger "size" can only come
        # from a corrupt DHT whose value bytes aren't magnitude classes —
        # reading it would overflow the int64 coefficient store
        return None
    v = r.bits(size)
    if v is None:
        return None
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


# ---------------------------------------------------------------------------
# Decoder — multi-scan coefficient accumulation (baseline AND progressive)
# ---------------------------------------------------------------------------
#
# Every scan decodes into per-component int64 coefficient arrays in zigzag
# order; pixels materialize once at EOI (dequantize → de-zigzag → IDCT →
# upsample → color). Baseline is the one-scan special case, progressive
# (SOF2, ITU-T T.81 §G) accumulates DC first/refinement and AC
# first/refinement (spectral-selection bands, successive approximation,
# EOB runs) across scans — the refinement algorithms follow §G.2 in the
# same shape as the libjpeg reference implementation.


def _decode_block_seq(reader, blk, dc_tbl, ac_tbl, pred: int):
    """Sequential full-band block decode into zigzag-order ``blk``;
    returns the new DC predictor or None."""
    size = reader.huff(dc_tbl)
    if size is None:
        return None
    diff = _receive_extend(reader, size)
    if diff is None:
        return None
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        rs = reader.huff(ac_tbl)
        if rs is None:
            return None
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += run
        if k > 63:
            return None
        v = _receive_extend(reader, size)
        if v is None:
            return None
        blk[k] = v
        k += 1
    return pred


def _decode_block_dc_first(reader, blk, dc_tbl, al: int, pred: int):
    """Progressive DC first scan: predictor arithmetic as sequential,
    value stored shifted left by the successive-approximation Al."""
    size = reader.huff(dc_tbl)
    if size is None:
        return None
    diff = _receive_extend(reader, size)
    if diff is None:
        return None
    pred += diff
    blk[0] = pred << al
    return pred

def _decode_block_dc_refine(reader, blk, al: int) -> bool:
    """Progressive DC refinement: one appended bit per block, OR-ed into
    bit Al of the (two's-complement) DC value."""
    bit = reader.bits(1)
    if bit is None:
        return False
    if bit:
        blk[0] = int(blk[0]) | (1 << al)
    return True


def _decode_block_ac_first(reader, blk, ac_tbl, ss, se, al, eobrun):
    """Progressive AC first scan for one block (§G.2.2): returns the new
    EOB run or None. Values store sign-magnitude shifted by Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.huff(ac_tbl)
        if rs is None:
            return None
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:
                k += 16  # ZRL
                continue
            eobrun = (1 << run) - 1  # EOBn: current block ends now
            if run:
                more = reader.bits(run)
                if more is None:
                    return None
                eobrun += more
            return eobrun
        k += run
        if k > se:
            return None
        v = _receive_extend(reader, size)
        if v is None:
            return None
        blk[k] = v << al if v >= 0 else -((-v) << al)
        k += 1
    return 0


def _decode_block_ac_refine(reader, blk, ac_tbl, ss, se, al, eobrun):
    """Progressive AC refinement for one block (§G.2.3 / libjpeg
    decode_mcu_AC_refine): returns the new EOB run or None. Correction
    bits refine already-nonzero coefficients (sign-magnitude: bit Al of
    the magnitude); symbols with s==1 make coefficients newly significant
    at ±2^Al after skipping ``r`` zero-HISTORY positions."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.huff(ac_tbl)
            if rs is None:
                return None
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:
                    eobrun = 1 << run
                    if run:
                        more = reader.bits(run)
                        if more is None:
                            return None
                        eobrun += more
                    break  # correction bits for the band tail, below
                val = 0  # ZRL: skip 16 zero-history coefficients
            elif size == 1:
                bit = reader.bits(1)
                if bit is None:
                    return None
                val = p1 if bit else -p1
            else:
                return None  # refinement symbols carry s in {0, 1} only
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    bit = reader.bits(1)
                    if bit is None:
                        return None
                    if bit and (abs(c) & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else -p1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        # EOB case: correction bits through the band tail — only
        # nonzero-HISTORY coefficients consume a bit, so visit exactly
        # those (r12: the per-position walk over all-zero constant-block
        # tails dominated progressive decode)
        if k <= se:
            for k2 in (k + np.flatnonzero(blk[k : se + 1])).tolist():
                c = int(blk[k2])
                bit = reader.bits(1)
                if bit is None:
                    return None
                if bit and (abs(c) & p1) == 0:
                    blk[k2] = c + (p1 if c > 0 else -p1)
        eobrun -= 1
    return eobrun


def _next_marker(data: bytes, pos: int) -> int:
    """First position ≥ pos of a real marker (0xFF followed by a non-zero,
    non-fill byte) — where the entropy-coded segment ends."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return len(data)


def _decode_scan(
    data,
    pos,
    scomps,  # [(ci, tdc, tac)] in scan order
    ss,
    se,
    ah,
    al,
    comps,  # [(cid, hi, vi, tq)] frame order
    coef,  # per-comp (BH, BW, 64) int64 zigzag arrays
    own_blocks,  # per-comp (own_bh, own_bw) non-interleaved block dims
    mcu_dims,  # (mcuy, mcux)
    huff_dc,
    huff_ac,
    restart_interval,
    progressive,
):
    """Decode one entropy-coded scan into ``coef``; returns the position
    of the marker after the scan, or None on corrupt data."""
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0
    need_dc = ss == 0
    need_ac = se > 0

    def check_tables(tdc, tac) -> bool:
        if need_dc and not (progressive and ah > 0) and tdc not in huff_dc:
            return False
        if need_ac and tac not in huff_ac:
            return False
        return True

    def do_block(ci, tdc, tac, blk):
        nonlocal eobrun
        if not progressive:
            p = _decode_block_seq(reader, blk, huff_dc.get(tdc), huff_ac.get(tac), pred[ci])
            if p is None:
                return False
            pred[ci] = p
            return True
        if ss == 0:  # DC scan (progressive DC scans have Se == 0)
            if ah == 0:
                p = _decode_block_dc_first(reader, blk, huff_dc.get(tdc), al, pred[ci])
                if p is None:
                    return False
                pred[ci] = p
                return True
            return _decode_block_dc_refine(reader, blk, al)
        if ah == 0:
            e = _decode_block_ac_first(reader, blk, huff_ac.get(tac), ss, se, al, eobrun)
        else:
            e = _decode_block_ac_refine(reader, blk, huff_ac.get(tac), ss, se, al, eobrun)
        if e is None:
            return False
        eobrun = e
        return True

    for ci, tdc, tac in scomps:
        if not check_tables(tdc, tac):
            return None

    mcuy, mcux = mcu_dims
    unit = 0
    if len(scomps) == 1:
        # non-interleaved (§A.2.2): the component's OWN block grid; the
        # restart interval counts blocks
        ci, tdc, tac = scomps[0]
        own_bh, own_bw = own_blocks[ci]
        for by in range(own_bh):
            for bx in range(own_bw):
                if restart_interval and unit and unit % restart_interval == 0:
                    if not reader.align_and_consume_rst():
                        return None
                    pred = [0] * len(comps)
                    eobrun = 0
                if not do_block(ci, tdc, tac, coef[ci][by, bx]):
                    return None
                unit += 1
    else:
        # interleaved (§A.2.3): MCU grid; per MCU each scan component
        # contributes its hi×vi blocks top-to-bottom, left-to-right
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    if not reader.align_and_consume_rst():
                        return None
                    pred = [0] * len(comps)
                    eobrun = 0
                for ci, tdc, tac in scomps:
                    _, hi, vi, _ = comps[ci]
                    for vy in range(vi):
                        for vx in range(hi):
                            blk = coef[ci][my * vi + vy, mx * hi + vx]
                            if not do_block(ci, tdc, tac, blk):
                                return None
                unit += 1
    return _next_marker(data, reader.pos)


def decode_jpeg(payload: bytes):
    """JPEG bytes → uint8 ndarray (H×W gray, H×W×3 RGB), or ``None`` for
    anything outside the supported subset (12-bit, arithmetic coding,
    lossless/hierarchical frames, sampling factors >2, truncated or
    corrupt data).

    Supported for real: 8-bit baseline sequential (SOF0) AND progressive
    (SOF2 — spectral selection, successive approximation, EOB runs,
    interleaved DC + non-interleaved AC scans per §G), 1-component
    grayscale and 3-component YCbCr at sampling factors 1-2 per axis
    (4:4:4 / 4:2:2 / 4:2:0), restart markers in both modes. All scans
    accumulate into per-component coefficient arrays; pixels materialize
    once at EOI — dequantize, de-zigzag, float64 IDCT, replication
    chroma upsample, BT.601 inverse."""
    data = bytes(payload)
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hi, vi, qid)]
    progressive = False
    restart_interval = 0
    coef = None
    own_blocks = mcu_dims = None
    got_scan = False

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (spec allows 0xFF padding runs)
            pos += 1
            continue
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:
            break  # EOI
        if 0xD0 <= marker <= 0xD7:
            return None  # stray restart marker outside a scan
        if pos + 4 > len(data):
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) < seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of subset
                if i + 65 > len(seg):
                    return None
                qt[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=i + 1
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT (may arrive between scans)
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    return None
                tbl = _huff_table(bits, vals)
                if tbl is None:
                    return None  # oversubscribed DHT — reject the image
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                return None
            progressive = marker == 0xC2
            prec = seg[0]
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            nc = seg[5]
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            if h * w > _MAX_PIXELS:
                # a 2-byte header field can declare 65535x65535 (34 GB of
                # float64 plane per component) — corrupt or adversarial
                # bytes must quarantine, not OOM the executor
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    return None  # sampling factors >2: out of subset
                comps.append((cid, hi, vi, tq))
            if nc == 1:
                # a single-component image is always scanned
                # non-interleaved; its sampling factors don't partition
                # the data — normalize so the grids below match
                comps = [(comps[0][0], 1, 1, comps[0][3])]
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic frame types
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            h, w, comps = frame
            if coef is None:
                h_max = max(hi for _, hi, _, _ in comps)
                v_max = max(vi for _, _, vi, _ in comps)
                mcux = (w + 8 * h_max - 1) // (8 * h_max)
                mcuy = (h + 8 * v_max - 1) // (8 * v_max)
                mcu_dims = (mcuy, mcux)
                coef = [
                    np.zeros((mcuy * vi * 8 // 8, mcux * hi * 8 // 8, 64), dtype=np.int64)
                    for _, hi, vi, _ in comps
                ]
                own_blocks = []
                for _, hi, vi, _ in comps:
                    cw = (w * hi + h_max - 1) // h_max
                    ch = (h * vi + v_max - 1) // v_max
                    own_blocks.append(((ch + 7) // 8, (cw + 7) // 8))
            ns = seg[0] if seg else 0
            if ns < 1 or len(seg) < 1 + 2 * ns + 3:
                return None
            cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
            scomps = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                if cid not in cid_to_ci:
                    return None
                scomps.append((cid_to_ci[cid], tabs >> 4, tabs & 0x0F))
            if [ci for ci, _, _ in scomps] != sorted(set(ci for ci, _, _ in scomps)):
                return None  # scan components must follow frame order
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            else:
                if ss > 63 or se > 63 or se < ss:
                    return None
                if ss == 0 and se != 0:
                    return None  # progressive DC scans carry only DC
                if ss > 0 and ns != 1:
                    return None  # AC scans are single-component
            nxt = _decode_scan(
                data,
                pos + 2 + seglen,
                scomps,
                ss,
                se,
                ah,
                al,
                comps,
                coef,
                own_blocks,
                mcu_dims,
                huff_dc,
                huff_ac,
                restart_interval,
                progressive,
            )
            if nxt is None:
                return None
            pos = nxt
            got_scan = True
            continue
        pos += 2 + seglen
    if frame is None or not got_scan:
        return None

    h, w, comps = frame
    h_max = max(hi for _, hi, _, _ in comps)
    v_max = max(vi for _, _, vi, _ in comps)
    imgs = []
    for (cid, hi, vi, tq), arr in zip(comps, coef):
        if tq not in qt:
            return None
        q = qt[tq]
        bh, bw = arr.shape[:2]
        # dequantize + de-zigzag + inverse DCT over ALL blocks in one
        # broadcast matmul (r12) — identical per-slice 8×8 GEMM, so
        # float results match the old per-block loop bit for bit
        dez = np.zeros((bh, bw, 64), dtype=np.float64)
        dez[:, :, ZIGZAG] = arr * q
        pix = _DCT.T @ dez.reshape(bh, bw, 8, 8) @ _DCT
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # sample-replication upsample (deterministic — a SQL twin can
        # mirror it), then crop the MCU padding and level-shift
        if vi != v_max:
            plane = np.repeat(plane, v_max // vi, axis=0)
        if hi != h_max:
            plane = np.repeat(plane, h_max // hi, axis=1)
        imgs.append(
            np.clip(np.round(plane[:h, :w] + 128.0), 0, 255).astype(np.uint8)
        )
    if len(imgs) == 1:
        return imgs[0]
    # YCbCr (BT.601 full-range, the JFIF convention) → RGB
    y = imgs[0].astype(np.float64)
    cb = imgs[1].astype(np.float64) - 128.0
    cr = imgs[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (baseline; quant table configurable)
# ---------------------------------------------------------------------------


def _encode_block(
    writer: _BitWriter,
    blk: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """FDCT → quantize → Huffman-encode one level-shifted 8×8 block;
    returns the new DC predictor."""
    coeff = _DCT @ blk @ _DCT.T
    zz = np.round(coeff.reshape(64)[ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    size = abs(diff).bit_length()
    code, length = dc_codes[size]
    if size:
        # code and appended value bits in ONE writer call (MSB-first
        # packing makes concatenation associative) — r12: write() call
        # count was the top encoder cost after the block scan
        v = diff if diff > 0 else diff + (1 << size) - 1
        writer.write((code << size) | v, length + size)
    else:
        writer.write(code, length)
    # visit only the nonzero AC positions (r12): the constant-block
    # corpora the oracle tier runs are ~all-zero, and the 63-position
    # Python scan dominated the encode profile
    prev = 0
    for k in (np.flatnonzero(zz[1:]) + 1).tolist():
        run = k - prev - 1
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        v = int(zz[k])
        size = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        bitsv = v if v > 0 else v + (1 << size) - 1
        writer.write((c << size) | bitsv, ln + size)
        prev = k
    if prev < 63:
        c, ln = ac_codes[0x00]  # EOB
        writer.write(c, ln)
    return int(zz[0])


def _pad_replicate(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Pad to (out_h, out_w) by edge replication so block DCTs stay tame."""
    h, w = plane.shape
    out = np.zeros((out_h, out_w), dtype=np.float64)
    out[:h, :w] = plane
    if h < out_h:
        out[h:, :w] = out[h - 1 : h, :w]
    if w < out_w:
        out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg_gray(img, quant: int | np.ndarray = 1, restart_interval: int = 0) -> bytes:
    """uint8 H×W grayscale → baseline JPEG bytes.

    ``quant``: scalar or 64-entry table (zigzag order). The default
    all-ones table makes constant 8×8 blocks round-trip EXACTLY (DC-only,
    step-1 quantization) — the property the oracle-paired query relies
    on; a real deployment would pass a perceptual table instead.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    q = (
        np.full(64, int(quant), dtype=np.int64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int64).reshape(64)
    )
    dc_codes = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    padded = _pad_replicate(img.astype(np.float64), bh_ * 8, bw_ * 8)

    writer = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(bh_):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = 0
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            pred = _encode_block(writer, blk, q, pred, dc_codes, ac_codes)
            mcu += 1
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg_ycbcr(
    img,
    sampling: tuple = ((2, 2), (1, 1), (1, 1)),
    quant: int | np.ndarray = 1,
    restart_interval: int = 0,
) -> bytes:
    """uint8 H×W×3 **YCbCr** → interleaved baseline JPEG bytes with
    per-component sampling factors — default (2,2),(1,1),(1,1) = 4:2:0,
    the dominant layout of real crawled corpora; (1,1)×3 gives 4:4:4 and
    ((2,1),(1,1),(1,1)) gives 4:2:2.

    The input is YCbCr directly (JFIF full-range), NOT RGB: skipping the
    forward color transform is what preserves the constant-block
    exactness contract — chroma downsampling is a box mean (exact on
    regions constant per chroma block), and a constant 8×8 block is
    DC-only, so with the default step-1 quantization it survives
    encode→decode bit-exactly. With Cb=Cr=128 the decoder's BT.601
    inverse returns R=G=B=Y with zero float error, which is what lets a
    SQL oracle replay a LOSSY 4:2:0 round trip integer-exactly
    (queries/media.py ``decoded_jpeg420_stats``). All components share
    quantization table 0 and the Annex-K luminance Huffman pair —
    smaller than a camera's two-table layout but fully spec-valid.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w, nc = img.shape
    assert nc == 3 and len(sampling) == 3
    samp = [(int(sh), int(sv)) for sh, sv in sampling]
    for sh, sv in samp:
        if sh not in (1, 2) or sv not in (1, 2):
            raise ValueError(f"sampling factors must be 1 or 2, got {samp}")
    h_max = max(sh for sh, _ in samp)
    v_max = max(sv for _, sv in samp)
    q = (
        np.full(64, int(quant), dtype=np.int64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int64).reshape(64)
    )
    dc_codes = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    mcux = (w + 8 * h_max - 1) // (8 * h_max)
    mcuy = (h + 8 * v_max - 1) // (8 * v_max)
    # full-res pad to the MCU grid, then box-mean down to each
    # component's own resolution (exact on constant chroma regions)
    planes = []
    for ci, (sh, sv) in enumerate(samp):
        full = _pad_replicate(
            img[:, :, ci].astype(np.float64), mcuy * v_max * 8, mcux * h_max * 8
        )
        fy, fx = v_max // sv, h_max // sh
        if fy > 1 or fx > 1:
            fh, fw = full.shape
            full = full.reshape(fh // fy, fy, fw // fx, fx).mean(axis=(1, 3))
        planes.append(full)

    writer = _BitWriter()
    pred = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                out += writer.out
                writer = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0, 0, 0]
            for ci, (sh, sv) in enumerate(samp):
                for vy in range(sv):
                    for vx in range(sh):
                        py = (my * sv + vy) * 8
                        px = (mx * sh + vx) * 8
                        blk = planes[ci][py : py + 8, px : px + 8] - 128.0
                        pred[ci] = _encode_block(
                            writer, blk, q, pred[ci], dc_codes, ac_codes
                        )
            mcu += 1
    writer.flush()
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2, ITU-T T.81 Annex G)
# ---------------------------------------------------------------------------
#
# Exists so the distributed pipeline (and the decoder above) can be
# exercised on REAL multi-scan progressive streams without shipping
# binary fixtures. The AC-scan emitters mirror the decoder's walk
# position-for-position — every symbol is followed by exactly the
# correction bits the refinement decoder consumes while advancing over
# that symbol's span — so bit-order agreement is true by construction
# rather than by matching a third-party implementation's buffering.
# Annex K's AC table lacks the EOBn symbols (n ≥ 1) progressive needs,
# so progressive files carry their own flat 8-bit-code AC table.

_PROG_AC_VALS = sorted(
    [n << 4 for n in range(15)]                       # EOBn, n = 0..14
    + [0xF0]                                          # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_PROG_AC_BITS = [0] * 7 + [len(_PROG_AC_VALS)] + [0] * 8  # all codes len 8


class _ProgScanState:
    """Per-scan entropy state: bit writer + pending EOB run with the
    correction bits owned by the run's blocks (emitted after the EOBn
    symbol, in block-walk order — exactly where the decoder's EOB-tail
    processing reads them)."""

    def __init__(self, writer, dc_codes, ac_codes):
        self.w = writer
        self.dc = dc_codes
        self.ac = ac_codes
        self.eobrun = 0
        self.corr: list[int] = []

    def sym(self, codes, s) -> None:
        c, l = codes[s]
        self.w.write(c, l)

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            self.sym(self.ac, n << 4)
            if n:
                self.w.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
            for b in self.corr:
                self.w.write(b, 1)
            self.corr = []

    def bump_eob(self, tail_bits: list[int]) -> None:
        self.eobrun += 1
        self.corr.extend(tail_bits)
        # EOBn tops out at n=14 → run ≤ 0x7FFF; keep the bit buffer bounded
        if self.eobrun == 0x7FFF or len(self.corr) >= 937:
            self.flush_eob()


def _enc_dc_first(st, dcval: int, al: int, pred: int) -> int:
    """DC first scan: diff coding of the point-transformed (arithmetic
    right shift, §G.1.2.1) DC value."""
    t = dcval >> al
    diff = t - pred
    size = abs(diff).bit_length()
    st.sym(st.dc, size)
    if size:
        st.w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    return t


def _enc_ac_first(st, zz, ss: int, se: int, al: int) -> None:
    """AC first scan for one block: run/size coding of the
    truncate-toward-zero point-transformed band, EOB runs for all-zero
    tails and blocks."""
    band = np.asarray(zz[ss : se + 1], dtype=np.int64)
    if not band.any():  # all-zero band: EOB regardless of Al
        st.bump_eob([])
        return
    # truncate-toward-zero point transform, then visit only nonzeros
    # (r12: the per-position Python walk dominated progressive encode on
    # the ~all-zero constant-block corpora)
    tband = np.where(band >= 0, band >> al, -((-band) >> al))
    nz = np.flatnonzero(tband)
    if not len(nz):
        st.bump_eob([])
        return
    st.flush_eob()
    prev = -1
    for i in nz.tolist():
        r = i - prev - 1
        while r > 15:
            st.sym(st.ac, 0xF0)
            r -= 16
        t = int(tband[i])
        size = abs(t).bit_length()
        st.sym(st.ac, (r << 4) | size)
        st.w.write(t if t > 0 else t + (1 << size) - 1, size)
        prev = i
    if prev < len(tband) - 1:
        st.bump_eob([])


def _enc_ac_refine(st, zz, ss: int, se: int, al: int) -> None:
    """AC refinement scan for one block (§G.1.2.3). ``run`` counts only
    zero-HISTORY positions; already-significant coefficients contribute
    a correction bit (bit ``al`` of the magnitude) at the moment the
    decoder's advance walk passes them."""
    barr = np.asarray(zz[ss : se + 1], dtype=np.int64)
    if not barr.any():  # all-zero history: no newly-significant, no
        st.bump_eob([])  # correction bits — plain EOB bump
        return
    tvarr = np.abs(barr) >> al
    band = barr.tolist()
    tv = tvarr.tolist()
    newly = np.flatnonzero(tvarr == 1).tolist()
    if not newly:
        st.bump_eob([int(t) & 1 for t in tvarr[tvarr > 1].tolist()])
        return
    st.flush_eob()
    i = 0  # decoder walk pointer over the band
    for target in newly:
        r = sum(1 for j in range(i, target) if tv[j] == 0)
        while r > 15:
            # ZRL: the decoder consumes 16 zero-history positions,
            # reading a correction bit at each history coefficient passed
            st.sym(st.ac, 0xF0)
            zeros = 0
            while zeros < 16:
                if tv[i] == 0:
                    zeros += 1
                elif tv[i] > 1:
                    st.w.write(tv[i] & 1, 1)
                i += 1
            r -= 16
        st.sym(st.ac, (r << 4) | 1)
        st.w.write(1 if band[target] > 0 else 0, 1)
        for j in range(i, target):
            if tv[j] > 1:
                st.w.write(tv[j] & 1, 1)
        i = target + 1
    if i < len(tv):
        st.bump_eob([tv[j] & 1 for j in range(i, len(tv)) if tv[j] > 1])


def _fdct_quant_blocks(plane, q):
    """Level-shift → FDCT → quantize a padded float64 plane into a
    (bh, bw, 64) int64 zigzag-order coefficient grid."""
    import numpy as _np

    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    # one broadcast matmul over all blocks (r12) — np.matmul runs the
    # identical 8×8 GEMM per stacked slice, so the per-block float
    # summation order (and hence every rounded coefficient) is unchanged
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coeff = _DCT @ blocks @ _DCT.T
    return _np.round(
        coeff.reshape(bh, bw, 64)[:, :, ZIGZAG] / q
    ).astype(_np.int64)


def encode_jpeg_progressive(
    img,
    sampling: tuple = ((2, 2), (1, 1), (1, 1)),
    quant: int | np.ndarray = 1,
    restart_interval: int = 0,
    dc_al: int = 1,
    ac_bands: tuple = ((1, 5), (6, 63)),
    ac_al: int = 1,
) -> bytes:
    """uint8 H×W grayscale or H×W×3 **YCbCr** → progressive (SOF2) JPEG.

    Scan script: interleaved DC first scan at Al=``dc_al`` plus one DC
    refinement per remaining bit; then per spectral band in ``ac_bands``
    (must tile 1..63) a non-interleaved AC first scan per component at
    Al=``ac_al`` plus successive-approximation refinements down to 0.
    Same coefficient math, sampling-factor layout, and constant-block
    exactness contract as ``encode_jpeg_ycbcr`` — a progressive file of
    the same image decodes to bit-identical pixels (the property the
    round-trip tests pin)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if gray:
        h, w = img.shape
        samp = [(1, 1)]
    else:
        h, w, nc3 = img.shape
        assert nc3 == 3 and len(sampling) == 3
        samp = [(int(sh), int(sv)) for sh, sv in sampling]
        for sh, sv in samp:
            if sh not in (1, 2) or sv not in (1, 2):
                raise ValueError(f"sampling factors must be 1 or 2, got {samp}")
    nc = len(samp)
    flat = sorted(ac_bands)
    if [b for band in flat for b in band] != [
        x for ss, se in zip([1] + [e + 1 for _, e in flat[:-1]], [e for _, e in flat]) for x in (ss, se)
    ] or flat[0][0] != 1 or flat[-1][1] != 63:
        raise ValueError(f"ac_bands must tile 1..63 contiguously, got {ac_bands}")
    h_max = max(sh for sh, _ in samp)
    v_max = max(sv for _, sv in samp)
    q = (
        np.full(64, int(quant), dtype=np.int64)
        if np.isscalar(quant)
        else np.asarray(quant, dtype=np.int64).reshape(64)
    )
    mcux = (w + 8 * h_max - 1) // (8 * h_max)
    mcuy = (h + 8 * v_max - 1) // (8 * v_max)
    coefs = []
    own = []
    for ci, (sh, sv) in enumerate(samp):
        plane = (img if gray else img[:, :, ci]).astype(np.float64)
        full = _pad_replicate(plane, mcuy * v_max * 8, mcux * h_max * 8)
        fy, fx = v_max // sv, h_max // sh
        if fy > 1 or fx > 1:
            fh, fw = full.shape
            full = full.reshape(fh // fy, fy, fw // fx, fx).mean(axis=(1, 3))
        coefs.append(_fdct_quant_blocks(full, q))
        cw = (w * sh + h_max - 1) // h_max
        ch = (h * sv + v_max - 1) // v_max
        own.append(((ch + 7) // 8, (cw + 7) // 8))

    dc_codes = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_codes = _encode_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC2, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS),
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    # scan script
    scans = [(list(range(nc)), 0, 0, 0, dc_al)]
    for al in range(dc_al - 1, -1, -1):
        scans.append((list(range(nc)), 0, 0, al + 1, al))
    for ss, se in ac_bands:
        for ci in range(nc):
            scans.append(([ci], ss, se, 0, ac_al))
    for al in range(ac_al - 1, -1, -1):
        for ss, se in ac_bands:
            for ci in range(nc):
                scans.append(([ci], ss, se, al + 1, al))

    rst = 0
    for scomps, ss, se, ah, al in scans:
        body = bytes([len(scomps)])
        for ci in scomps:
            body += bytes([ci + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, body)

        writer = _BitWriter()
        st = _ProgScanState(writer, dc_codes, ac_codes)
        pred = [0] * nc
        unit = 0

        def maybe_restart():
            nonlocal writer, st, pred, rst
            if restart_interval and unit and unit % restart_interval == 0:
                st.flush_eob()
                writer.flush()
                out.extend(writer.out)
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                writer = _BitWriter()
                st.w = writer
                pred = [0] * nc

        def block(ci, by, bx):
            zz = coefs[ci][by, bx]
            if ss == 0:
                if ah == 0:
                    pred[ci] = _enc_dc_first(st, int(zz[0]), al, pred[ci])
                else:
                    st.w.write((int(zz[0]) >> al) & 1, 1)
            else:
                if ah == 0:
                    _enc_ac_first(st, zz, ss, se, al)
                else:
                    _enc_ac_refine(st, zz, ss, se, al)

        if len(scomps) == 1:
            ci = scomps[0]
            own_bh, own_bw = own[ci]
            for by in range(own_bh):
                for bx in range(own_bw):
                    maybe_restart()
                    block(ci, by, bx)
                    unit += 1
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci in scomps:
                        sh, sv = samp[ci]
                        for vy in range(sv):
                            for vx in range(sh):
                                block(ci, my * sv + vy, mx * sh + vx)
                    unit += 1
        st.flush_eob()
        writer.flush()
        out.extend(writer.out)

    out += b"\xFF\xD9"
    return bytes(out)
