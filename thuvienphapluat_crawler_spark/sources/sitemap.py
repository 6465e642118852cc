"""Sitemap XML source (sitemaps.org protocol): seed discovery for the
crawl tier.

Reference framing: the crawler seeds from hand-listed category pages
(`crawler.py` walks thuvienphapluat's listing pages); the web-scale
counterpart is the sitemap protocol — fetch /sitemap.xml, recurse
<sitemapindex> into child <urlset> pages, diff discovered <loc>s
against the seen set, enqueue the new ones. robots.txt (sources/
robots.py) already handles the exclusion half; this module is the
discovery half.

Real XML both ways: the writer emits namespaced sitemaps.org documents
and the reader is stdlib ElementTree with explicit namespace handling —
malformed XML, a wrong root element, or a <url> without <loc> raise.
Hostile-XML caveat (honest boundary): ElementTree never fetches
external entities, and the bundled expat ships amplification limits
against billion-laughs-style internal expansion, but a production
crawler parsing adversarial sitemaps should still wrap this in
defusedxml or an explicit DTD reject — this repo's inputs are
synthesized, so the walker's strictness is about FORMAT correctness,
not attacker containment.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

SITEMAP_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


class SitemapFormatError(ValueError):
    pass


def encode_urlset(entries: list[tuple[str, str]]) -> str:
    """<urlset> document from (loc, lastmod) pairs."""
    parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset xmlns="{SITEMAP_NS}">']
    for loc, lastmod in entries:
        parts.append(f"<url><loc>{loc}</loc><lastmod>{lastmod}</lastmod></url>")
    parts.append("</urlset>")
    return "\n".join(parts)


def encode_sitemapindex(locs: list[str]) -> str:
    """<sitemapindex> document pointing at child sitemaps."""
    parts = [
        f'<?xml version="1.0" encoding="UTF-8"?>\n<sitemapindex xmlns="{SITEMAP_NS}">'
    ]
    for loc in locs:
        parts.append(f"<sitemap><loc>{loc}</loc></sitemap>")
    parts.append("</sitemapindex>")
    return "\n".join(parts)


def parse_sitemap(xml: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Parse either sitemap document kind. Returns ('urlset', [(loc,
    lastmod)]) or ('index', [(loc, None)]). Raises SitemapFormatError on
    malformed XML, an unexpected root, or an entry without <loc>."""
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        raise SitemapFormatError(f"malformed XML: {e}") from e
    kind_by_tag = {
        f"{{{SITEMAP_NS}}}urlset": ("urlset", f"{{{SITEMAP_NS}}}url"),
        f"{{{SITEMAP_NS}}}sitemapindex": ("index", f"{{{SITEMAP_NS}}}sitemap"),
    }
    if root.tag not in kind_by_tag:
        raise SitemapFormatError(f"unexpected root element {root.tag!r}")
    kind, child_tag = kind_by_tag[root.tag]
    out: list[tuple[str, str | None]] = []
    for child in root.findall(child_tag):
        loc = child.find(f"{{{SITEMAP_NS}}}loc")
        if loc is None or not (loc.text or "").strip():
            raise SitemapFormatError("entry without <loc>")
        lastmod = child.find(f"{{{SITEMAP_NS}}}lastmod")
        out.append(
            (loc.text.strip(), lastmod.text.strip() if lastmod is not None else None)
        )
    return kind, out
