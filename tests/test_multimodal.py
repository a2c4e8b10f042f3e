"""Real image-decode tier (pure-numpy PGM/PPM/BMP): the resize stage must
operate on ACTUAL PIXELS — tests assert on decoded dimensions and pixel
values of the output payloads, not on metadata columns."""

from __future__ import annotations

import struct

import numpy as np

from network_iq_spark.operators.multimodal import (
    decode_image,
    encode_pnm,
    resample_nearest,
    resize_media,
)


def _make_bmp(img: np.ndarray) -> bytes:
    """Minimal uncompressed 24-bit bottom-up BMP encoder (test-side)."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    data = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r][:, ::-1].tobytes()  # RGB -> BGR
        data += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return bytes(header) + info + bytes(data)


def test_pnm_roundtrip_gray_and_color():
    gray = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert np.array_equal(decode_image(encode_pnm(gray)), gray)
    rgb = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    assert np.array_equal(decode_image(encode_pnm(rgb)), rgb)


def test_pnm_header_with_comments_and_whitespace():
    gray = np.full((2, 3), 7, dtype=np.uint8)
    payload = b"P5 # comment\n# another\n 3   2\n255\n" + gray.tobytes()
    assert np.array_equal(decode_image(payload), gray)


def test_bmp_decode_matches_ppm_pixels():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(_make_bmp(img)), img)
    assert np.array_equal(decode_image(_make_bmp(img)), decode_image(encode_pnm(img)))


def test_decode_rejects_unknown_or_truncated():
    assert decode_image(b"") is None
    assert decode_image(b"\x89PNG\r\n") is None
    gray = np.zeros((4, 4), dtype=np.uint8)
    assert decode_image(encode_pnm(gray)[:-3]) is None  # truncated raster


def test_resample_nearest_center_aligned_indices():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = resample_nearest(img, 4, 4)
    # floor((i+0.5)*8/4) = 2i+1 -> rows/cols {1,3,5,7}
    assert np.array_equal(out, img[[1, 3, 5, 7]][:, [1, 3, 5, 7]])


def test_resize_media_resamples_actual_pixels(spark):
    """The output payload must DECODE to the target dimensions with the
    nearest-neighbor-selected source pixels — asserting on pixels, not on
    the metadata columns."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(500, 1000, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(100, 100), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_pnm(img)), "image", 1000, 500, None),  # wide -> 336x168
        (2, bytearray(_make_bmp(img[:100, :100])), "image", 100, 100, None),  # fits
        (3, bytearray(encode_pnm(gray)), "image", 100, 100, None),  # gray, fits
        (4, bytearray(b"not-an-image"), "image", 1000, 500, None),  # stub path
    ]
    df = spark.createDataFrame(
        rows,
        "media_id bigint, payload binary, media_type string, "
        "width int, height int, duration_ms int",
    )
    got = {r["media_id"]: r for r in resize_media(df, 336, 336).collect()}

    out1 = decode_image(bytes(got[1]["payload"]))
    assert got[1]["decode_status"] == "resized"
    assert out1.shape == (168, 336, 3)
    assert np.array_equal(out1, resample_nearest(img, 336, 168))

    out2 = decode_image(bytes(got[2]["payload"]))
    assert got[2]["decode_status"] == "resized"
    assert out2.shape == (100, 100, 3)  # within bounds: pixels untouched
    assert np.array_equal(out2, img[:100, :100])

    out3 = decode_image(bytes(got[3]["payload"]))
    assert out3.shape == (100, 100)
    assert np.array_equal(out3, gray)

    assert got[4]["decode_status"] == "ok"  # honest fallback, payload intact
    assert bytes(got[4]["payload"]) == b"not-an-image"


def test_binaryfile_source_to_resize_end_to_end(spark, tmp_path):
    """Real files on disk → binaryFile scan → MEDIA schema → header decode
    for dims → aspect-preserving resize on ACTUAL pixels. The whole
    multimodal path with no synthetic DataFrames anywhere."""
    from network_iq_spark.sources.binary import read_media_dir, with_image_dims

    rng = np.random.default_rng(3)
    imgs = {}
    for i, (h, w) in enumerate([(64, 128), (32, 32), (100, 40)]):
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        (tmp_path / f"img_{i}.pgm").write_bytes(encode_pnm(img))
        imgs[f"img_{i}.pgm"] = img
    (tmp_path / "notes.txt").write_text("not an image")

    media = read_media_dir(spark, str(tmp_path), glob="*.pgm")
    rows = with_image_dims(media).collect()
    assert len(rows) == 3  # glob pruned the txt at listing time
    by_name = {r["media_path"].rsplit("/", 1)[-1]: r for r in rows}
    assert (by_name["img_0.pgm"]["width"], by_name["img_0.pgm"]["height"]) == (128, 64)
    assert (by_name["img_2.pgm"]["width"], by_name["img_2.pgm"]["height"]) == (40, 100)
    # ids deterministic across scans
    again = {r["media_path"]: r["media_id"] for r in read_media_dir(
        spark, str(tmp_path), glob="*.pgm").collect()}
    assert {r["media_path"]: r["media_id"] for r in rows} == again

    resized = resize_media(
        with_image_dims(media).drop("media_path"), 48, 48
    ).collect()
    out = {r["media_id"]: r for r in resized}
    for name, img in imgs.items():
        mid = by_name[name]["media_id"]
        dec = decode_image(bytes(out[mid]["payload"]))
        h, w = img.shape
        s = min(48 / w, 48 / h, 1.0)
        exp_w, exp_h = (w, h) if s == 1.0 else (
            48 if w * 48 >= h * 48 and w >= h else int(w * 48 / max(w, h)),
            int(h * 48 / max(w, h)) if w >= h else 48,
        )
        assert dec.shape == (exp_h, exp_w), name
        assert out[mid]["decode_status"] == "resized"


def test_png_roundtrip_all_filters_gray_and_rgb():
    """encode_png/decode_png round-trip bit-exactly for every filter type
    (None/Sub/Up/Average/Paeth), both pinned per-file and cycling, on gray
    and RGB images of awkward shapes."""
    from network_iq_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(8, 8), (5, 9), (1, 1), (8, 8, 3), (3, 4, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for filters in [None, [0], [1], [2], [3], [4], [4, 2, 0]]:
            got = decode_png(encode_png(img, filters))
            assert got is not None and got.shape == img.shape
            assert (got == img).all(), (shape, filters)
    # dispatch through decode_image
    img = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    assert (decode_image(encode_png(img)) == img).all()


def test_png_alpha_channels_decoded_and_dropped():
    """Color types 4 (gray+alpha) and 6 (RGBA) decode with the alpha plane
    stripped — stats pipelines want pixels, not opacity."""
    import zlib

    from network_iq_spark.operators.multimodal import _PNG_SIG, decode_png

    def chunk(t: bytes, b: bytes) -> bytes:
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    rng = np.random.default_rng(12)
    for color_type, ch in [(4, 2), (6, 4)]:
        w, h = 4, 3
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        raw = b"".join(b"\x00" + px[r].tobytes() for r in range(h))
        png = (
            _PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        got = decode_png(png)
        want = px[:, :, 0] if ch == 2 else px[:, :, :3]
        assert got.shape == want.shape and (got == want).all(), color_type


def test_png_rejects_corrupt_truncated_unsupported():
    from network_iq_spark.operators.multimodal import decode_png, encode_png

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_png(img)
    assert decode_png(b"") is None
    assert decode_png(b"\x89PNG\r\n\x1a\nnot-a-chunk") is None
    assert decode_png(good[:20]) is None  # truncated mid-IHDR
    bad = bytearray(good)
    bad[50] ^= 0xFF  # corrupt the deflate stream
    assert decode_png(bytes(bad)) is None
    # 16-bit depth unsupported -> None, not garbage
    hdr16 = bytearray(good)
    hdr16[24] = 16  # bit-depth byte inside IHDR
    assert decode_png(bytes(hdr16)) is None


def test_resize_media_handles_png_payloads(spark):
    """A PNG payload flows through the SAME distributed resize stage as
    PNM/BMP: decoded (all filter paths), resampled, re-encoded, status
    'resized'."""
    from network_iq_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)), "image", 8, 8, None)],
        "media_id bigint, payload binary, media_type string, "
        "width int, height int, duration_ms int",
    )
    out = resize_media(df, 4, 4).collect()[0]
    assert out.decode_status == "resized"
    dec = decode_image(bytes(out.payload))
    assert dec.shape == (4, 4)
    assert (dec == resample_nearest(img, 4, 4)).all()
