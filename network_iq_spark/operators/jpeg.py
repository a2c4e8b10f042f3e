"""Pure-numpy baseline JPEG codec (SURVEY.md §7 F, multimodal tier).

Reference behavior: the reference pipeline hands image bytes to a native
codec; this container has none, so the baseline-DCT path is implemented
directly from the JPEG spec (ITU-T T.81): marker parse, canonical Huffman
decode, dequantize, de-zigzag, float64 IDCT, level shift. Supported:
8-bit baseline sequential, 1-component grayscale and 3-component YCbCr
with sampling factors 1 or 2 per axis — 4:4:4, 4:2:2, and 4:2:0 (the
dominant format of real crawled corpora; chroma planes decode at their
own resolution per the interleaved-MCU order of §A.2.3 and upsample by
sample replication before the color transform), with restart markers.
Progressive, arithmetic coding, and 12-bit return ``None`` — the
caller falls back to the metadata-only path, never garbage pixels.

The encoder exists so the distributed pipeline can be exercised end to
end on REAL JPEG bytes without shipping binary fixtures: it emits
spec-valid baseline files (Annex K quantization + Huffman tables work
everywhere). Constant 8×8 blocks survive the DCT→quantize→dequantize→IDCT
round trip bit-exactly (only the DC coefficient is nonzero and it is
quantized with step 1), which is what makes an integer-exact DuckDB
oracle possible for a lossy codec — see queries/llmdata.py
``decoded_jpeg_stats``.
"""

from __future__ import annotations

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


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol map from a DHT (bits, values) spec."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) map (encoder direction)."""
    return {v: (c, l) for (l, c), v in _canonical_codes(bits, vals).items()}


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
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                return False  # restart marker: caller consumes it
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def bits(self, k: int) -> int | None:
        while self.n < k:
            if not self._fill():
                return None
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.bits(1)
            if b is None:
                return None
            code = (code << 1) | b
            if (length, code) in table:
                return table[(length, code)]
        return None

    def align_and_consume_rst(self) -> bool:
        """Drop partial byte, consume an RSTn marker; False if absent."""
        self.acc = 0
        self.n = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return True
        return False


def _receive_extend(r: _BitReader, size: int) -> int | None:
    if size == 0:
        return 0
    v = r.bits(size)
    if v is None:
        return None
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes):
    """Baseline JPEG bytes → uint8 ndarray (H×W gray, H×W×3 RGB), or
    ``None`` for anything outside the supported subset (progressive,
    12-bit, arithmetic, sampling factors >2, truncated or corrupt
    data). 4:2:0 / 4:2:2 chroma subsampling decodes for real: blocks
    arrive in interleaved-MCU order (§A.2.3 — per MCU, each component
    contributes its h×v blocks top-to-bottom, left-to-right), chroma
    planes reconstruct at their own resolution and upsample by sample
    replication before the YCbCr transform."""
    data = bytes(payload)
    if len(data) < 4 or data[:2] != b"\xFF\xD8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hi, vi, qid)]
    comp_tables: dict[int, tuple[int, int]] = {}
    restart_interval = 0
    scan_order: list[int] = []

    while pos + 4 <= len(data):
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
            return None  # EOI before SOS
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
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    return None
                tbl = _canonical_codes(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack_from(">H", seg, 1)[0], struct.unpack_from(">H", seg, 3)[0], seg[5]
            if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    return None  # sampling factors >2: out of subset
                comps.append((cid, hi, vi, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                comp_tables[cid] = (tabs >> 4, tabs & 0x0F)
            scan_order = [seg[1 + 2 * c] for c in range(ns)]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    else:
        return None
    if frame is None or not scan_order:
        return None

    h, w, comps = frame
    if [cid for cid, _, _, _ in comps] != scan_order:
        return None
    # A single-component scan is NON-interleaved per §A.2.2: the MCU is one
    # block and the declared sampling factors don't partition the data —
    # normalize them to 1×1 so the generic loop below walks the component's
    # own block grid (also the historic grayscale behavior of this decoder).
    if len(comps) == 1:
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    h_max = max(hi for _, hi, _, _ in comps)
    v_max = max(vi for _, _, vi, _ in comps)
    mcux = (w + 8 * h_max - 1) // (8 * h_max)
    mcuy = (h + 8 * v_max - 1) // (8 * v_max)
    planes = [
        np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        for _, hi, vi, _ in comps
    ]
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                if not reader.align_and_consume_rst():
                    return None
                pred = [0] * len(comps)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                tdc, tac = comp_tables.get(cid, (0, 0))
                if tdc not in huff_dc or tac not in huff_ac or tq not in qt:
                    return None
                for vy in range(vi):
                    for vx in range(hi):
                        size = reader.huff(huff_dc[tdc])
                        if size is None:
                            return None
                        diff = _receive_extend(reader, size)
                        if diff is None:
                            return None
                        pred[ci] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.huff(huff_ac[tac])
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
                            zz[k] = v
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt[tq]
                        b8 = block.reshape(8, 8)
                        pix = _DCT.T @ b8 @ _DCT  # inverse DCT (orthonormal)
                        py = (my * vi + vy) * 8
                        px = (mx * hi + vx) * 8
                        planes[ci][py : py + 8, px : px + 8] = pix
            mcu += 1

    # per-component upsample to full resolution (sample replication —
    # nearest-neighbor, the deterministic choice a SQL twin can mirror),
    # then crop the MCU padding and level-shift
    imgs = []
    for (cid, hi, vi, tq), p in zip(comps, planes):
        if vi != v_max:
            p = np.repeat(p, v_max // vi, axis=0)
        if hi != h_max:
            p = np.repeat(p, h_max // hi, axis=1)
        imgs.append(
            np.clip(np.round(p[:h, :w] + 128.0), 0, 255).astype(np.uint8)
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
    size = int(diff).bit_length() if diff != 0 else 0
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        writer.write(v, size)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k] != 0], default=0)
    for k in range(1, 64):
        if k > last_nz:
            c, ln = ac_codes[0x00]  # EOB
            writer.write(c, ln)
            break
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]  # ZRL
            writer.write(c, ln)
            run -= 16
        v = int(zz[k])
        size = abs(v).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        writer.write(c, ln)
        bitsv = v if v > 0 else v + (1 << size) - 1
        writer.write(bitsv, size)
        run = 0
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
    (queries/llmdata.py ``decoded_jpeg420_stats``). All components share
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
