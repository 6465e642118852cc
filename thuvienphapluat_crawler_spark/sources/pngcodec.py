"""Minimal real PNG codec (SURVEY §2.1 S5 / multimodal decode tier;
reference: ocr/ocr_pdf.py:37-45 renders PDF pages to PNG via PyMuPDF
before the VLM call, ocr/sample_ocr_gpt41mini.py base64-encodes them).

PyMuPDF/Pillow are absent from the container, so r01/r02 stubbed image
decode. But PNG itself is zlib + CRC32 + byte filters — all stdlib:
encode_png writes a spec-valid 8-bit RGB PNG (IHDR/IDAT/IEND, CRCs,
per-row filter types cycling through all five so the decoder's unfilter
paths are exercised), decode_png recovers the exact pixel array from any
non-interlaced 8-bit RGB/RGBA PNG (inflate → unfilter None/Sub/Up/
Average/Paeth). resize_nearest is the feature-extract helper the
multimodal plumbing uses. What still genuinely needs a native library:
rasterizing a PDF page INTO pixels, palette/16-bit/interlaced PNGs, and
JPEG — those stay behind the multimodal.py decode flag.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, row_filters: tuple[int, ...] = (0, 1, 2, 3, 4)) -> bytes:
    """Spec-valid non-interlaced 8-bit RGB PNG from a (h, w, 3) uint8
    array. Filter type for row r is row_filters[r % len(row_filters)] —
    the default cycles None/Sub/Up/Average/Paeth so a decoder must
    implement all of them. Callers encoding LARGE pages pass a cheap set
    (e.g. (0, 2)) the way real encoders pick per-row filter heuristics;
    pixel content is identical either way. Deterministic bytes for
    identical input."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("need (h, w, 3) uint8")
    h, w, _ = img.shape
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int16)
    for r in range(h):
        cur = img[r].reshape(-1).astype(np.int16)
        ft = row_filters[r % len(row_filters)]
        if ft == 0:
            flt = cur
        elif ft == 2:
            flt = cur - prev
        else:
            left = np.concatenate([np.zeros(3, np.int16), cur[:-3]])
            if ft == 1:
                flt = cur - left
            elif ft == 3:
                flt = cur - (left + prev) // 2
            else:  # Paeth
                upleft = np.concatenate([np.zeros(3, np.int16), prev[:-3]])
                p = left + prev - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
                flt = cur - pred
        raw.append(ft)
        raw += (flt % 256).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from a non-interlaced 8-bit RGB/RGBA PNG (alpha
    dropped). Verifies signature + chunk CRCs; anything else (palette,
    16-bit, interlace) raises NotImplementedError — the honest subset."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in (2, 6) or inter:
                raise NotImplementedError("only 8-bit RGB/RGBA non-interlaced")
            bpp = 3 if ctype == 2 else 4
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("no IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    at = 0
    for r in range(h):
        ft = raw[at]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=at + 1).astype(np.int32)
        at += 1 + stride
        if ft == 0:
            cur = row
        elif ft == 1:
            # Sub: recon[i] = raw[i] + recon[i-bpp] → per-channel prefix
            # sum mod 256 (vectorized; no sequential dependency left)
            cur = (np.cumsum(row.reshape(w, bpp), axis=0) % 256).reshape(stride)
        elif ft == 2:
            cur = (row + prev) % 256
        elif ft in (3, 4):
            # Average/Paeth: the left byte is the recurrence — sequential
            # in x, but over plain Python lists (an order of magnitude
            # faster than per-element numpy indexing on big rows)
            rl, pl = row.tolist(), prev.tolist()
            cl = [0] * stride
            if ft == 3:
                for i in range(stride):
                    a = cl[i - bpp] if i >= bpp else 0
                    cl[i] = (rl[i] + ((a + pl[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = cl[i - bpp] if i >= bpp else 0
                    b = pl[i]
                    c = pl[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cl[i] = (rl[i] + pred) & 0xFF
            cur = np.array(cl, dtype=np.int32)
        else:
            raise ValueError(f"bad filter {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, bpp)
    return np.ascontiguousarray(px[:, :, :3])


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize — the thumbnail/feature step of the
    multimodal path; pure index math, vectorized."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[np.ix_(ri, ci)]
