"""Minimal real WAV/RIFF codec (multimodal audio decode tier; reference:
the crawler routes PDF/image attachments through external decoders —
ocr/ocr_pdf.py:37-45 — and the multimodal table models audio the same
way, as an opaque binary column plus typed metadata).

ffmpeg/soundfile are absent from the container, so audio decode was a
deterministic fake through r04. But canonical PCM WAV is pure stdlib:
RIFF framing + a 16-byte 'fmt ' chunk + a 'data' chunk of interleaved
little-endian samples. encode_wav writes a spec-valid PCM 16-bit file;
decode_wav walks the RIFF chunk list honestly (skips unknown chunks,
honors the odd-size pad byte, validates magics and fmt fields) and
returns the sample matrix — so audio joins PNG as a REAL modality.
What still genuinely needs a native library: lossy codecs (MP3/AAC/
Opus), float/ADPCM WAV variants, and resampling — those stay behind
the multimodal.py decode flag.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM 16-bit WAV from an (n_frames, n_channels) int array.

    Interleaves channels frame-major (the spec's block layout), writes
    RIFF/WAVE + fmt (PCM, 16-bit) + data.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_ch = samples.shape
    if not (1 <= n_ch <= 64):
        raise WavFormatError(f"unsupported channel count {n_ch}")
    if samples.size and (samples.min() < -32768 or samples.max() > 32767):
        # loud failure, matching every other codec path — astype('<i2')
        # would silently wrap 40000 → -25536 (ADVICE r05)
        raise WavFormatError(
            f"samples outside int16 range [{int(samples.min())}, {int(samples.max())}]"
        )
    pcm = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    block_align = n_ch * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, byte_rate, block_align, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    if len(pcm) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM 16-bit WAV → ((n_frames, n_channels) int16 array,
    sample_rate). Walks the chunk list (LIST/INFO etc. skipped, odd
    sizes padded per spec); raises WavFormatError on anything that is
    not canonical PCM 16-bit."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if riff_size + 8 > len(data):
        raise WavFormatError("truncated RIFF payload")
    pos = 12
    # bound the walk at the declared RIFF payload — trailing garbage after
    # a valid payload must not change the decode (ADVICE r05)
    end = min(len(data), 8 + riff_size)
    fmt_fields = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        chunk = data[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise WavFormatError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if size < 16:
                raise WavFormatError("fmt chunk too short")
            fmt_fields = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            if pcm is not None:
                raise WavFormatError("duplicate data chunk")
            pcm = chunk
        pos += 8 + size + (size % 2)  # pad byte on odd sizes
    if fmt_fields is None or pcm is None:
        raise WavFormatError("missing fmt or data chunk")
    audio_format, n_ch, sample_rate, byte_rate, block_align, bits = fmt_fields
    if audio_format != 1 or bits != 16:
        raise WavFormatError(
            f"only PCM 16-bit supported (got format={audio_format}, bits={bits}); "
            "float/ADPCM/compressed WAV needs a native audio library"
        )
    if n_ch < 1 or block_align != n_ch * 2 or byte_rate != sample_rate * block_align:
        raise WavFormatError("inconsistent fmt fields")
    n_frames = len(pcm) // block_align
    arr = np.frombuffer(pcm[: n_frames * block_align], dtype="<i2").reshape(n_frames, n_ch)
    return arr.astype(np.int16), sample_rate


def wav_stats(data: bytes) -> dict:
    """Decode + summarize: the integer-exact features the oracle can
    replay (sum of squares / peak are exact in int64 — no float parity
    hazards across engines)."""
    arr, rate = decode_wav(data)
    n_frames, n_ch = arr.shape
    a64 = arr.astype(np.int64)
    return {
        "sample_rate": int(rate),
        "channels": int(n_ch),
        "n_frames": int(n_frames),
        "duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "peak": int(np.abs(a64).max()) if a64.size else 0,
        "sum_sq": int((a64 * a64).sum()),
    }
