"""GIF codec (operators/gif.py): LZW round trips must be bit-exact
(GIF is lossless — the property decoded_gif_stats' oracle relies on),
interlace must reorder rows correctly, and corrupt bytes must quarantine."""

from __future__ import annotations

import random
import struct

import numpy as np

from network_iq_spark.operators.gif import decode_gif, encode_gif
from network_iq_spark.operators.multimodal import decode_image, sniff_format


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
