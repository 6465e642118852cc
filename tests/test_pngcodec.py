"""S5 real PNG codec (sources/pngcodec.py).

Reference behavior: ocr/ocr_pdf.py:37-45 — page → PNG for the VLM tier.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np
import pytest

from thuvienphapluat_crawler_spark.sources.pngcodec import (
    decode_png,
    encode_png,
    resize_nearest,
)


def _img(h, w, seed=7):
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    return np.stack(
        [(seed + 3 * i + 7 * j) % 256, (5 * i + j) % 256, (i * j + seed) % 256], axis=-1
    ).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (5, 3), (12, 16), (17, 23)])
def test_roundtrip_exercises_all_filters(h, w):
    # h ≥ 5 covers every filter type (row r uses filter r % 5)
    img = _img(h, w)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_deterministic_bytes():
    img = _img(9, 11)
    assert encode_png(img) == encode_png(img)


def test_crc_is_verified():
    data = bytearray(encode_png(_img(6, 6)))
    # flip one byte inside IDAT payload
    at = data.index(b"IDAT") + 6
    data[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_rgba_decodes_alpha_dropped():
    # hand-build a 1x2 RGBA PNG (filter 0) — decoder keeps RGB only
    px = bytes([0, 10, 20, 30, 255, 40, 50, 60, 128])  # filter byte + 2 RGBA px
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", crc32(tag + body) & 0xFFFFFFFF
        )

    data = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(px)) + chunk(b"IEND", b"")
    )
    assert decode_png(data).tolist() == [[[10, 20, 30], [40, 50, 60]]]


def test_unsupported_flavors_raise():
    img = encode_png(_img(4, 4))
    pal = img.replace(struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0),
                      struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0), 1)
    # IHDR CRC now wrong — rebuild it so the ctype check is what fires
    body = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)
    pal = (
        img[:8] + struct.pack(">I", 13) + b"IHDR" + body
        + struct.pack(">I", crc32(b"IHDR" + body) & 0xFFFFFFFF) + img[33:]
    )
    with pytest.raises(NotImplementedError):
        decode_png(pal)
    with pytest.raises(ValueError):
        decode_png(b"GIF89a not a png")


def test_resize_nearest():
    img = _img(8, 8)
    out = resize_nearest(img, 4, 4)
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out, img[::2, ::2])
    assert np.array_equal(resize_nearest(img, 8, 8), img)
