"""Baseline JPEG codec (operators/jpeg.py): pure-numpy decode must invert
the encoder bit-exactly for constant blocks (the oracle-bearing property),
stay within rounding error at quantization step 1, and reject everything
outside the supported subset instead of emitting garbage."""

from __future__ import annotations

import struct

import numpy as np

from network_iq_spark.operators.jpeg import (
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    _BitWriter,
    _encode_codes,
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_ycbcr,
)
from network_iq_spark.operators.multimodal import decode_image


def test_constant_blocks_roundtrip_exactly():
    """DC-only blocks with step-1 quantization survive the lossy pipeline
    bit-exactly — the property decoded_jpeg_stats' oracle relies on."""
    rng = np.random.default_rng(3)
    for grid in [(1, 1), (2, 2), (3, 5)]:
        vals = rng.integers(0, 256, size=grid, dtype=np.uint8)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        got = decode_jpeg(encode_jpeg_gray(img))
        assert got is not None and got.shape == img.shape
        assert (got == img).all(), grid


def test_general_image_step1_quantization_near_lossless():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(24, 16), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_gray(img))
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_odd_dimensions_and_restart_markers():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(13, 10), dtype=np.uint8)
    plain = decode_jpeg(encode_jpeg_gray(img))
    with_rst = decode_jpeg(encode_jpeg_gray(img, restart_interval=1))
    assert plain.shape == (13, 10)
    assert (plain == with_rst).all()  # restart path decodes identically


def test_lossy_quant_table_decodes_sanely():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg_gray(img, quant=16))
    assert got.shape == img.shape
    # heavily quantized but still the same picture, not noise
    assert np.abs(got.astype(float) - img.astype(float)).mean() < 16


def test_decode_image_dispatches_jpeg():
    img = np.kron(
        np.array([[7, 250]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    assert (decode_image(encode_jpeg_gray(img)) == img).all()


def test_rejects_garbage_truncation_and_invalid_progressive():
    img = np.full((8, 8), 90, dtype=np.uint8)
    good = encode_jpeg_gray(img)
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xFF\xD8\xFF\xD9") is None
    assert decode_jpeg(good[:30]) is None
    # flip SOF0 (0xC0) to SOF2 (0xC2): the stream now CLAIMS progressive
    # but its single scan has Ss=0, Se=63 — illegal for SOF2 (progressive
    # DC scans carry only DC, §G.1.1.1.1) -> None, never garbage
    prog = bytearray(good)
    idx = prog.find(b"\xFF\xC0")
    prog[idx + 1] = 0xC2
    assert decode_jpeg(bytes(prog)) is None


def _encode_color_444_gray_chroma(y_img: np.ndarray) -> bytes:
    """Test-side 3-component 4:4:4 encoder: luma = constant blocks from
    ``y_img``, both chroma planes = 128 (zero after level shift), all
    components sharing the luminance tables. Exercises the decoder's
    interleaved-MCU and YCbCr→RGB paths."""
    h, w = y_img.shape
    dc = _encode_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac = _encode_codes(_AC_LUM_BITS, _AC_LUM_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM_BITS) + bytes(_DC_LUM_VALS)
        + bytes([0x10]) + bytes(_AC_LUM_BITS) + bytes(_AC_LUM_VALS),
    )
    sos = bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    out += seg(0xDA, sos + bytes([0, 63, 0]))

    wtr = _BitWriter()
    pred = [0, 0, 0]
    for by in range(h // 8):
        for bx in range(w // 8):
            for ci in range(3):
                const = (
                    int(y_img[by * 8, bx * 8]) if ci == 0 else 128
                )
                dc_coef = round((const - 128) * 8.0)  # orthonormal DC = 8*mean
                diff = dc_coef - pred[ci]
                pred[ci] = dc_coef
                size = abs(diff).bit_length()
                code, ln = dc[size]
                wtr.write(code, ln)
                if size:
                    v = diff if diff > 0 else diff + (1 << size) - 1
                    wtr.write(v, size)
                code, ln = ac[0x00]  # EOB — constant block has no ACs
                wtr.write(code, ln)
    wtr.flush()
    out += wtr.out + b"\xFF\xD9"
    return bytes(out)


def test_color_444_decode_neutral_chroma_yields_gray_rgb():
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 256, size=(2, 2), dtype=np.uint8)
    y = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    got = decode_jpeg(_encode_color_444_gray_chroma(y))
    assert got is not None and got.shape == (16, 16, 3)
    for c in range(3):
        assert (got[:, :, c] == y).all(), c


def test_fill_bytes_before_markers_are_skipped():
    """The spec allows runs of 0xFF fill bytes before any marker — real
    encoders emit them for alignment; a parser that treats 0xFF as a
    marker id misreads everything after."""
    img = np.kron(
        np.array([[50, 200]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    good = encode_jpeg_gray(img)
    # inject fill bytes before the SOF0 marker
    idx = good.find(b"\xFF\xC0")
    padded = good[:idx] + b"\xFF\xFF\xFF" + good[idx:]
    got = decode_jpeg(padded)
    assert got is not None and (got == img).all()


def _mcu_const_luma(vals: np.ndarray) -> np.ndarray:
    """2×2 grid of 16×16 constant MCUs from a 2×2 value array."""
    return np.kron(vals, np.ones((16, 16), dtype=np.uint8))


def test_420_constant_mcu_neutral_chroma_roundtrips_exactly():
    """4:2:0: luma constant per 16×16 MCU, chroma neutral (128) — every
    block DC-only at step-1 quantization, so the LOSSY round trip is
    bit-exact and RGB == Y replicated (the oracle-bearing property of
    decoded_jpeg420_stats). Restart markers every 2 MCUs on top."""
    vals = np.array([[10, 200], [90, 255]], dtype=np.uint8)
    y = _mcu_const_luma(vals)
    img = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], axis=-1)
    got = decode_jpeg(encode_jpeg_ycbcr(img, restart_interval=2))
    assert got is not None and got.shape == (32, 32, 3)
    for c in range(3):
        assert (got[:, :, c] == y).all(), c


def test_420_nonzero_chroma_matches_direct_bt601():
    """Chroma constant per chroma block (here: globally) decodes through
    the subsampled plane + replication-upsample + BT.601 inverse to
    exactly the values the float formula predicts — the chroma path
    carries real signal, not just neutral 128s."""
    y = _mcu_const_luma(np.array([[40, 180], [90, 220]], dtype=np.uint8))
    cb = np.full_like(y, 200)
    cr = np.full_like(y, 60)
    got = decode_jpeg(encode_jpeg_ycbcr(np.stack([y, cb, cr], axis=-1)))
    yf, cbf, crf = y.astype(np.float64), cb - 128.0, cr - 128.0
    exp = np.stack(
        [
            np.clip(np.round(yf + 1.402 * crf), 0, 255),
            np.clip(np.round(yf - 0.344136 * cbf - 0.714136 * crf), 0, 255),
            np.clip(np.round(yf + 1.772 * cbf), 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    assert (got == exp).all()


def test_422_and_444_sampling_layouts_decode():
    """The same generic MCU walk handles 4:2:2 (2×1 luma) and 4:4:4
    through encode_jpeg_ycbcr's sampling parameter."""
    y = _mcu_const_luma(np.array([[10, 200], [90, 255]], dtype=np.uint8))
    img = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], axis=-1)
    for sampling in (((2, 1), (1, 1), (1, 1)), ((1, 1), (1, 1), (1, 1))):
        got = decode_jpeg(encode_jpeg_ycbcr(img, sampling=sampling))
        assert got is not None and (got[:, :, 0] == y).all(), sampling


def test_420_crops_non_mcu_aligned_dimensions():
    """20×28 is not a multiple of the 16×16 MCU: the encoder pads by
    edge replication, the decoder must crop back to the declared size."""
    y = _mcu_const_luma(np.array([[7, 130], [60, 250]], dtype=np.uint8))[:20, :28]
    img = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], axis=-1)
    got = decode_jpeg(encode_jpeg_ycbcr(img))
    assert got is not None and got.shape == (20, 28, 3)
    assert (got[:, :, 0] == y).all()


def test_rejects_sampling_factors_above_two():
    """h or v of 3/4 is spec-legal but outside the subset — must return
    None (metadata fallback), never garbage pixels."""
    y = _mcu_const_luma(np.array([[10, 200], [90, 255]], dtype=np.uint8))
    img = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], axis=-1)
    good = encode_jpeg_ycbcr(img)
    bad = bytearray(good)
    idx = bad.find(b"\xFF\xC0")
    # marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1) then hv at idx+11
    assert bad[idx + 11] == 0x22
    bad[idx + 11] = 0x41  # h=4
    assert decode_jpeg(bytes(bad)) is None


# ---------------------------------------------------------------------------
# Progressive (SOF2) — every pixel must match the baseline decode of the
# same image: the two modes carry identical coefficients, so any defect in
# multi-scan accumulation, successive approximation, spectral bands, EOB
# runs, or restart handling surfaces as a pixel diff.
# ---------------------------------------------------------------------------

from network_iq_spark.operators.jpeg import (  # noqa: E402
    _DCT,
    ZIGZAG,
    encode_jpeg_progressive,
)


def _kq() -> np.ndarray:
    """A perceptual-style quant table (zigzag order) so sweeps also hit
    the sparse-coefficient regime with long zero runs."""
    return np.array(
        [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
         49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
        dtype=np.int64,
    )


def test_progressive_gray_matches_baseline():
    rng = np.random.default_rng(11)
    for trial in range(12):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        quant = [1, 4, 16, _kq()][trial % 4]
        ri = [0, 0, 3, 7][trial % 4]
        bands = [((1, 63),), ((1, 5), (6, 63)), ((1, 2), (3, 9), (10, 63))][trial % 3]
        base = decode_jpeg(encode_jpeg_gray(img, quant=quant, restart_interval=ri))
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, quant=quant, restart_interval=ri,
                dc_al=int(rng.integers(0, 3)), ac_bands=bands,
                ac_al=int(rng.integers(0, 3)),
            )
        )
        assert prog is not None and np.array_equal(base, prog), f"trial {trial}"


def test_progressive_color_all_samplings_match_baseline():
    rng = np.random.default_rng(12)
    for trial in range(9):
        h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        samp = [((1, 1),) * 3, ((2, 1), (1, 1), (1, 1)), ((2, 2), (1, 1), (1, 1))][
            trial % 3
        ]
        quant = [1, 4, _kq()][trial % 3]
        ri = [0, 2, 5][trial % 3]
        base = decode_jpeg(
            encode_jpeg_ycbcr(img, sampling=samp, quant=quant, restart_interval=ri)
        )
        prog = decode_jpeg(
            encode_jpeg_progressive(
                img, sampling=samp, quant=quant, restart_interval=ri,
                dc_al=int(rng.integers(0, 3)),
                ac_bands=[((1, 63),), ((1, 5), (6, 63))][trial % 2],
                ac_al=int(rng.integers(0, 3)),
            )
        )
        assert prog is not None and np.array_equal(base, prog), f"trial {trial}"


def test_progressive_sparse_ac_long_eob_runs():
    """Near-constant images with speckles: the all-EOB and EOBn>0 paths
    dominate, with multi-level successive approximation."""
    rng = np.random.default_rng(13)
    for trial in range(6):
        img = np.full((48, 48), 128, dtype=np.uint8)
        n = int(rng.integers(1, 12))
        img[rng.integers(0, 48, n), rng.integers(0, 48, n)] = rng.integers(0, 256, n)
        quant = [1, 8][trial % 2]
        base = decode_jpeg(encode_jpeg_gray(img, quant=quant))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quant=quant, dc_al=2, ac_al=2)
        )
        assert prog is not None and np.array_equal(base, prog), f"trial {trial}"


def test_progressive_ac_refine_zrl_with_history_coefficients(monkeypatch):
    """The adversarial refinement bit-ordering case: a newly-significant
    coefficient behind a >15 zero-history run (ZRL inside a refinement
    scan) with an already-significant coefficient interspersed — the
    decoder consumes each symbol's correction bits while advancing over
    that symbol's span, so any buffering mismatch in the encoder desyncs
    the stream. Random images essentially never produce this pattern, so
    it is injected at the coefficient level."""
    import network_iq_spark.operators.jpeg as J

    blk = np.zeros(64, dtype=np.int64)
    blk[0] = 37   # DC
    blk[5] = 8    # significant from the al=2 first scan (history coef)
    blk[20] = 1   # newly significant only at the final al=0 refine
    blk[40] = 3   # newly significant at al=1 after >15 zero-history slots
    blk[63] = -2  # band-tail newly-significant, negative sign path

    monkeypatch.setattr(
        J,
        "_fdct_quant_blocks",
        lambda plane, q: np.tile(blk, (plane.shape[0] // 8, plane.shape[1] // 8, 1)),
    )
    full = np.zeros(64)
    full[ZIGZAG] = blk
    exp = np.clip(
        np.round(_DCT.T @ full.reshape(8, 8) @ _DCT + 128), 0, 255
    ).astype(np.uint8)

    one = decode_jpeg(
        encode_jpeg_progressive(
            np.zeros((8, 8), np.uint8), quant=1, ac_bands=((1, 63),), ac_al=2
        )
    )
    assert one is not None and np.array_equal(one, exp)
    four = decode_jpeg(
        encode_jpeg_progressive(
            np.zeros((16, 16), np.uint8), quant=1, dc_al=2,
            ac_bands=((1, 30), (31, 63)), ac_al=2, restart_interval=2,
        )
    )
    assert four is not None and np.array_equal(four, np.tile(exp, (2, 2)))


def test_progressive_constant_mcu_420_bit_exact():
    """The oracle-bearing property for decoded_jpeg_prog_stats: constant
    16x16 MCUs + neutral chroma survive a progressive 4:2:0 encode→decode
    bit-exactly (DC-only blocks, step-1 quantization, exact BT.601)."""
    ones = np.ones((16, 16), dtype=np.uint8)
    g = np.array([[200, 17], [93, 150]], dtype=np.uint8)
    y = np.kron(g, ones)
    ycc = np.stack([y, np.full_like(y, 128), np.full_like(y, 128)], axis=-1)
    img = decode_jpeg(encode_jpeg_progressive(ycc, restart_interval=2))
    assert img is not None and img.shape == (32, 32, 3)
    assert np.array_equal(img, np.stack([y] * 3, axis=-1))


def test_progressive_truncation_returns_none():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    p = encode_jpeg_progressive(img, quant=1)
    assert decode_jpeg(p[:40]) is None
    assert decode_jpeg(p[: len(p) // 2]) is None


def test_progressive_rejects_bad_band_spec():
    import pytest

    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg_progressive(img, ac_bands=((1, 5), (7, 63)))  # gap at 6
    with pytest.raises(ValueError):
        encode_jpeg_progressive(img, ac_bands=((2, 63),))  # misses 1


def test_huff_lut_matches_bitwise_reference():
    """Differential fuzz of the r12 16-bit-LUT Huffman fast path against
    the scalar bit-by-bit walk (the GIF LZW precedent): random Annex-K-
    and random-table streams, random stuffing/truncation — every
    (symbol, consumed-bits) sequence must be identical, including the
    None (corrupt/exhausted) terminations."""
    import random

    from network_iq_spark.operators.jpeg import (
        _AC_LUM_BITS,
        _AC_LUM_VALS,
        _DC_LUM_BITS,
        _DC_LUM_VALS,
        _BitReader,
        _huff_bitwise,
        _huff_table,
    )

    rng = random.Random(1234)
    tables = [
        _huff_table(_DC_LUM_BITS, _DC_LUM_VALS),
        _huff_table(_AC_LUM_BITS, _AC_LUM_VALS),
    ]
    # a sparse random table: 1 code of length 2, 2 of 5, 3 of 11 — leaves
    # most 16-bit prefixes INVALID, exercising the lut-miss path
    bits = [0, 1, 0, 0, 2, 0, 0, 0, 0, 0, 3, 0, 0, 0, 0, 0]
    tables.append(_huff_table(bits, list(range(sum(bits)))))
    for trial in range(300):
        tbl = tables[trial % len(tables)]
        raw = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
        # inject stuffing so the fill paths (bulk + 0xFF) both run
        stuffed = bytearray()
        for b in raw:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        data = bytes(stuffed)
        ra, rb = _BitReader(data, 0), _BitReader(data, 0)
        for step in range(20):
            sa = ra.huff(tbl)
            sb = _huff_bitwise(rb, tbl)
            assert sa == sb, (trial, step, sa, sb)
            if sa is None:
                break
            # behavioral alignment check: interleave a raw-bit read —
            # any consumed-position divergence shows up as a value
            # mismatch here or as a symbol mismatch next round
            # (internal (pos, n) are NOT comparable: the bulk fill
            # buffers ahead across stuffing pairs)
            k = 1 + (trial + step) % 7
            assert ra.bits(k) == rb.bits(k), (trial, step, k)


def test_rejects_oversubscribed_dht():
    """r12 ADVICE: an oversubscribed DHT (Kraft sum > 1) would give the
    16-bit LUT overlapping fill ranges (last-writer-wins) while the
    bitwise walk matches first-defined — the spec must be rejected at
    table build so both decode paths stay identical on ALL inputs."""
    from network_iq_spark.operators.jpeg import _canonical_codes, _huff_table

    # 3 codes of length 1: only 2 slots exist
    bad1 = [3] + [0] * 15
    # length 1 full (2 codes), then any length-2 code: no slots remain
    bad2 = [2, 1] + [0] * 14
    for bits in (bad1, bad2):
        vals = list(range(sum(bits)))
        assert _canonical_codes(bits, vals) is None
        assert _huff_table(bits, vals) is None
    # a COMPLETE table (Kraft sum exactly 1) stays accepted
    full = [0, 4] + [0] * 14  # 4 codes of length 2 = the whole level
    assert _huff_table(full, [1, 2, 3, 4]) is not None

    # image-level: splice an oversubscribed DHT into an otherwise valid
    # stream -> decode_jpeg(None), never a divergent symbol stream
    img = np.full((8, 8), 77, dtype=np.uint8)
    good = encode_jpeg_gray(img)
    assert decode_jpeg(good) is not None
    i = good.find(b"\xFF\xC4")
    (seglen,) = struct.unpack_from(">H", good, i + 2)
    bad_body = bytes([0x00]) + bytes(bad1) + bytes(range(3))
    bad_seg = struct.pack(">BBH", 0xFF, 0xC4, len(bad_body) + 2) + bad_body
    patched = good[:i] + bad_seg + good[i + 2 + seglen :]
    assert decode_jpeg(patched) is None


def test_dht_cache_single_entry_eviction():
    """r12 ADVICE: when the DHT cache fills, evict ONE entry (FIFO) —
    clearing the whole dict made a >64-distinct-spec corpus thrash every
    warm Annex-K table. Invalid specs must not be cached at all."""
    from network_iq_spark.operators import jpeg as J

    saved_dht, saved_enc = dict(J._DHT_CACHE), dict(J._ENC_CACHE)
    J._DHT_CACHE.clear()
    try:
        bits = [0, 2] + [0] * 14
        keys = []
        for i in range(J._DHT_CACHE_MAX + 5):
            vals = [i & 0xFF, (i >> 8) & 0xFF]
            assert J._huff_table(bits, vals) is not None
            keys.append(bytes(bits) + b"\xFF" + bytes(vals))
        assert len(J._DHT_CACHE) == J._DHT_CACHE_MAX
        # FIFO: exactly the 5 oldest evicted; everything else stays warm
        assert [k for k in keys if k in J._DHT_CACHE] == keys[5:]
        # oversubscribed spec: rejected AND not inserted
        before = dict(J._DHT_CACHE)
        assert J._huff_table([3] + [0] * 15, [0, 1, 2]) is None
        assert J._DHT_CACHE == before
    finally:
        J._DHT_CACHE.clear()
        J._DHT_CACHE.update(saved_dht)
        J._ENC_CACHE.clear()
        J._ENC_CACHE.update(saved_enc)
