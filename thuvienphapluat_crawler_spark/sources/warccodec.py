"""Minimal real WARC/1.0 web-archive codec (ISO 28500 — the Common
Crawl interchange format).

Reference framing: the crawler persists fetched pages as loose text
files plus a progress JSON (pipeline.py:71-74 filename sanitization,
upload_documents.py batching); a web-SCALE crawl persists segments in
WARC, the standard the entire CC/IA toolchain reads. This codec writes
spec-valid WARC response records — version line, named headers, exact
Content-Length octet framing, the two mandatory trailing CRLFs per
record — and walks them back with strict validation (truncation,
missing/duplicate headers, bad version line all raise), so the archive
sink/source pair is a REAL format boundary like pngcodec/wavcodec/
avicodec, not a pickle in disguise.

Determinism: WARC-Date is pinned (the sandbox forbids wall-clock reads
and the oracle must replay byte lengths closed-form) and record ids are
content-derived (urn:md5: of the target URI) rather than random UUIDs —
both noted deviations from production WARC, neither changing the frame
grammar.

What still genuinely needs more: gzip-per-record (.warc.gz) membership,
request/metadata record types, and WARC-Concurrent-To chains — all
header-level additions on the same frame walk.
"""

from __future__ import annotations

import hashlib

CRLF = "\r\n"
WARC_VERSION = "WARC/1.0"
WARC_DATE = "2026-01-01T00:00:00Z"  # pinned: deterministic archives


class WarcFormatError(ValueError):
    pass


def record_id_for(uri: str) -> str:
    return f"<urn:md5:{hashlib.md5(uri.encode()).hexdigest()}>"


def encode_record(uri: str, payload: bytes) -> bytes:
    """One spec-valid 'response' record: header block, blank line,
    payload block, two trailing CRLFs (ISO 28500 §4)."""
    header = (
        f"{WARC_VERSION}{CRLF}"
        f"WARC-Type: response{CRLF}"
        f"WARC-Record-ID: {record_id_for(uri)}{CRLF}"
        f"WARC-Date: {WARC_DATE}{CRLF}"
        f"WARC-Target-URI: {uri}{CRLF}"
        f"Content-Type: text/plain{CRLF}"
        f"Content-Length: {len(payload)}{CRLF}"
        f"{CRLF}"
    )
    return header.encode("ascii") + payload + (CRLF + CRLF).encode("ascii")


def encode_warc(records: list[tuple[str, bytes]]) -> bytes:
    """A WARC segment: the concatenation of records in input order."""
    return b"".join(encode_record(uri, payload) for uri, payload in records)


def decode_warc(data: bytes) -> list[tuple[int, dict[str, str], bytes]]:
    """Walk a WARC segment back into (offset, headers, payload) per
    record, strictly: a bad version line, a non-integer or missing
    Content-Length, a duplicated header, or a truncated payload/trailer
    all raise WarcFormatError. Offsets are byte positions of each
    record's 'WARC/1.0' line — the value a CDX index would store."""
    out: list[tuple[int, dict[str, str], bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        offset = pos
        eol = data.find(CRLF.encode(), pos)
        if eol < 0 or data[pos:eol].decode("ascii", "replace") != WARC_VERSION:
            raise WarcFormatError(f"bad version line at offset {pos}")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(CRLF.encode(), pos)
            if eol < 0:
                raise WarcFormatError("truncated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            try:
                name, value = line.decode("ascii").split(": ", 1)
            except ValueError as e:
                raise WarcFormatError(f"malformed header line {line!r}") from e
            if name in headers:
                raise WarcFormatError(f"duplicate header {name}")
            headers[name] = value
        if "Content-Length" not in headers:
            raise WarcFormatError("missing Content-Length")
        try:
            length = int(headers["Content-Length"])
        except ValueError as e:
            raise WarcFormatError("non-integer Content-Length") from e
        if length < 0 or pos + length + 4 > n:
            raise WarcFormatError("truncated payload")
        payload = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != (CRLF + CRLF).encode():
            raise WarcFormatError("missing record trailer")
        pos += 4
        out.append((offset, headers, payload))
    return out
