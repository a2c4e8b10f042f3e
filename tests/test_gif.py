"""GIF codec (operators/gif.py): LZW round trips must be bit-exact
(GIF is lossless — the property decoded_gif_stats' oracle relies on),
interlace must reorder rows correctly, and corrupt bytes must quarantine."""

from __future__ import annotations

import random
import struct

import numpy as np

from network_iq_spark.operators.gif import _lzw_decode, decode_gif, encode_gif
from network_iq_spark.operators.multimodal import decode_image, sniff_format


def _lzw_decode_ref(data: bytes, min_code: int, n_pixels: int):
    """Scalar per-code LZW reference — the ORIGINAL production decode,
    moved here in r11 when operators/gif.py was vectorized (VERDICT
    item 3). Kept verbatim as the differential-fuzz oracle; the one
    intentional change is the spec-true min_code cap (2–8: the old ≤11
    admission crashed on bytes([i>255]) before producing anything)."""
    if not 2 <= min_code <= 8:
        return None
    clear = 1 << min_code
    eoi = clear + 1
    pos = acc = nbits = 0

    def read(width):
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    def reset():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code + 1

    table, width = reset()
    prev = None
    out = bytearray()
    while len(out) < n_pixels:
        code = read(width)
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
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out[:n_pixels] if len(out) >= n_pixels else None


class _LZWWriterRef:
    """Scalar literal-only LZW writer — the ORIGINAL production encoder,
    moved here verbatim in r11 when operators/gif.py was vectorized
    (VERDICT item 3). Differential-fuzz oracle for
    _lzw_encode_literals."""

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


def test_lzw_encoder_vectorized_matches_scalar_writer():
    """The numpy literal coder emits the BYTE-IDENTICAL stream the scalar
    writer did, across palette depths and lengths that cross every width
    bump and the forced mid-stream CLEAR (> 4094−clear literals)."""
    from network_iq_spark.operators.gif import _lzw_encode_literals

    rng = np.random.default_rng(41)
    for mc in (2, 3, 4, 8):
        ncol = 1 << mc
        for n in (0, 1, 2, 255, 256, 4000, 4094 - (1 << mc), 4095 - (1 << mc),
                  9000, 20000):
            idxs = rng.integers(0, ncol, n, dtype=np.int64)
            wtr = _LZWWriterRef(mc)
            for v in idxs:
                wtr.literal(int(v))
            assert _lzw_encode_literals(idxs, mc) == wtr.finish(), (mc, n)


def test_lzw_vectorized_matches_scalar_reference():
    """Differential fuzz of the numpy LZW decode against the scalar
    per-code reference: valid encodes, truncations, byte flips, random
    garbage, and wrong n_pixels must agree EXACTLY (same bytes or both
    None) — the vectorization must be observationally invisible."""
    rng = np.random.default_rng(77)
    rnd = random.Random(78)
    cases = []
    for mc in (2, 3, 5, 8):
        ncol = 1 << mc
        for size in (1, 7, 300, 5000):
            px = rng.integers(0, ncol, size, dtype=np.uint8)
            # reuse the real encoder's LZW layer via a full encode/strip
            img = np.stack([px, px, px], -1).reshape(-1, 1, 3)
            payload = encode_gif(img)
            # extract the raw LZW stream back out of the container
            p = 13 + 3 * (2 << (payload[10] & 7))
            assert payload[p] == 0x2C
            p += 10
            lzw_min = payload[p]
            p += 1
            chunks = bytearray()
            while payload[p] != 0:
                ln = payload[p]
                chunks += payload[p + 1 : p + 1 + ln]
                p += 1 + ln
            cases.append((bytes(chunks), lzw_min, size))
    # COMPRESSIVE streams (entry + KwKwK codes): the shipped encoder is
    # literal-only, so the vectorized decoder's riskiest path — the
    # entry/KwKwK pointer-doubling expansion in _decode_run — needs a
    # real table-building LZW compressor to be exercised at all. This
    # one mirrors the decoder's width/CLEAR schedule exactly.
    def lzw_compress(idxs, mc):
        clear, eoi = 1 << mc, (1 << mc) + 1
        w0 = mc + 1
        out, acc, nb = bytearray(), 0, 0
        j = 0  # code position within the current run — the decoder's
        # width depends ONLY on this (one table append per code after
        # the first), so emitting at the positional width guarantees sync

        def width():
            if j == 0:
                return w0
            return min(12, max(w0, (clear + 1 + j).bit_length()))

        def emit(code):
            nonlocal acc, nb, j
            w = width()
            acc |= code << nb
            nb += w
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
            j += 1

        emit(clear)
        j = 0  # the run's codes start counting after the CLEAR
        table = {bytes([i]): i for i in range(clear)}
        nxt = clear + 2
        cur = b""
        for v in idxs:
            cand = cur + bytes([int(v)])
            if cand in table:
                cur = cand
                continue
            emit(table[cur])
            table[cand] = nxt
            nxt += 1
            if nxt >= (1 << 12):  # cannot emit 12+-bit entries: CLEAR
                emit(clear)
                j = 0
                table = {bytes([i]): i for i in range(clear)}
                nxt = clear + 2
            cur = bytes([int(v)])
        if cur:
            emit(table[cur])
        emit(eoi)
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    # low-entropy index streams: long runs force deep KwKwK/copy chains
    for mc, n in ((2, 6000), (4, 3000), (8, 20000)):
        ncol = 1 << mc
        runs = np.repeat(rng.integers(0, ncol, 400), rng.integers(1, 40, 400))
        idxs = runs[:n].astype(np.uint8)
        data = lzw_compress(idxs, mc)
        # the compressed stream must round-trip through BOTH decoders
        a = _lzw_decode(data, mc, len(idxs))
        b = _lzw_decode_ref(data, mc, len(idxs))
        assert a is not None and bytes(a) == idxs.tobytes()
        assert b is not None and bytes(b) == bytes(a)
        cases.append((data, mc, len(idxs)))
    for data, mc, n in cases:
        a = _lzw_decode(data, mc, n)
        b = _lzw_decode_ref(data, mc, n)
        assert (a is None) == (b is None) and (a is None or bytes(a) == bytes(b))
        # truncations + wrong pixel counts
        for cut in (0, 1, len(data) // 2, max(0, len(data) - 1)):
            for nn in (n, n + 1, max(1, n - 1), 1):
                a = _lzw_decode(data[:cut], mc, nn)
                b = _lzw_decode_ref(data[:cut], mc, nn)
                assert (a is None) == (b is None) and (
                    a is None or bytes(a) == bytes(b)
                ), (mc, n, cut, nn)
        # byte-level corruption
        for _ in range(120):
            broken = bytearray(data)
            for _ in range(rnd.randint(1, 4)):
                if broken:
                    broken[rnd.randrange(len(broken))] = rnd.randrange(256)
            a = _lzw_decode(bytes(broken), mc, n)
            b = _lzw_decode_ref(bytes(broken), mc, n)
            assert (a is None) == (b is None) and (
                a is None or bytes(a) == bytes(b)
            ), (mc, n)
    # pure garbage streams
    for _ in range(200):
        data = bytes(rng.integers(0, 256, rng.integers(0, 64), dtype=np.uint8))
        mc = rnd.randint(0, 12)
        n = rnd.randint(1, 64)
        a = _lzw_decode(data, mc, n)
        b = _lzw_decode_ref(data, mc, n)
        assert (a is None) == (b is None) and (a is None or bytes(a) == bytes(b))


def test_roundtrip_bit_exact_various_palettes():
    rng = np.random.default_rng(9)
    for trial in range(10):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        ncol = int(rng.integers(1, 17)) if trial % 3 else int(rng.integers(100, 257))
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (h, w))]
        got = decode_gif(encode_gif(img, interlace=trial % 2 == 1))
        assert got is not None and np.array_equal(got, img), trial


def test_roundtrip_through_width_bumps_and_clear():
    """6400 pixels of 256-color noise: the decoder table passes every
    width bump and the encoder must CLEAR before the 12-bit cap."""
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (80, 80, 1), dtype=np.uint8).repeat(3, -1)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gray_input_and_dispatch_and_sniff():
    rng = np.random.default_rng(12)
    g = rng.integers(0, 256, (12, 9), dtype=np.uint8)
    payload = encode_gif(g)
    assert sniff_format(payload) == "gif"
    got = decode_image(payload)
    assert np.array_equal(got, np.stack([g] * 3, -1))


def test_interlaced_encodes_differently_but_decodes_identically():
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 8, (17, 11))]
    plain, inter = encode_gif(img), encode_gif(img, interlace=True)
    assert plain != inter
    assert np.array_equal(decode_gif(plain), decode_gif(inter))


def test_corrupt_and_bomb_quarantine():
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (16, 16, 1), dtype=np.uint8).repeat(3, -1)
    good = encode_gif(img)
    assert decode_gif(b"") is None
    assert decode_gif(b"GIF89a") is None
    assert decode_gif(good[:20]) is None
    rnd = random.Random(15)
    for _ in range(2000):
        b = bytearray(good)
        for _ in range(rnd.randint(1, 8)):
            op = rnd.random()
            if op < 0.5 and b:
                b[rnd.randrange(len(b))] = rnd.randrange(256)
            elif op < 0.75 and b:
                del b[rnd.randrange(len(b))]
            else:
                b.insert(rnd.randrange(len(b) + 1), rnd.randrange(256))
        decode_gif(bytes(b))  # must not raise
    bomb = (
        b"GIF89a"
        + struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
        + bytes(6)
        + b"\x2C"
        + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
        + b"\x02\x01\x00\x00\x3B"
    )
    assert decode_gif(bomb) is None  # declared-dimension cap
