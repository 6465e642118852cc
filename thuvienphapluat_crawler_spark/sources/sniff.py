"""Magic-byte content-type sniffing — the routing step in front of
every decoder this repo ships.

Reference framing: the reference trusts file extensions
(ocr/format_doc.py routes on .doc/.docx/.pdf; pipeline.py writes .txt)
— a web-scale crawler cannot: servers lie about Content-Type and
extensions, so the media router (multimodal.route_media) wants the
verdict from the BYTES. This sniffer recognizes exactly the formats
the repo's real codecs read, by the same spec magics those codecs
validate, including the two-step containers: RIFF needs the subtype
FourCC at offset 8 (WAVE vs 'AVI '), and a PK zip needs a member-name
probe to call itself OOXML (xl/ → xlsx, word/ → docx — zip local-file
headers store names uncompressed, so a bounded prefix scan finds them
without inflating anything).

Pure function over leading bytes — used scan-side inside the same
mapInPandas that holds the blob, so sniffing adds zero shuffles and
the binary never leaves the pass.
"""

from __future__ import annotations

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(b: bytes) -> tuple[str, int]:
    """(format, depth): depth 1 = a single leading magic decided; depth
    2 = a container needed a second probe (RIFF subtype, zip member
    scan); depth 0 = nothing recognized."""
    if b[:5] == b"%PDF-":
        return "pdf", 1
    if b[:8] == PNG_MAGIC:
        return "png", 1
    if b[:4] == b"RIFF" and len(b) >= 12:
        sub = b[8:12]
        if sub == b"WAVE":
            return "wav", 2
        if sub == b"AVI ":
            return "avi", 2
        return "riff", 2
    if b[:8] == b"WARC/1.0":
        return "warc", 1
    if b[:4] == b"PK\x03\x04":
        head = b[:65536]
        if b"[Content_Types].xml" in head:
            if b"xl/" in head:
                return "xlsx", 2
            if b"word/" in head:
                return "docx", 2
            return "ooxml", 2
        return "zip", 2
    if b.lstrip()[:5] == b"<?xml":
        return "xml", 1
    try:
        b.decode("utf-8")
        return "text", 1
    except UnicodeDecodeError:
        return "unknown", 0
