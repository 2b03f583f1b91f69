"""Sitemap kernel — SEMANTICS.md §Sitemaps (build round 5, default OFF).

Two public-standard discovery channels real crawlers rely on:

- robots.txt ``Sitemap:`` directives name sitemap documents for a host
  (extracted in kernels/robots.py::robots_sitemaps via the same cached
  stdlib parser as the allow gate);
- sitemap documents (https://www.sitemaps.org/protocol.html) list page URLs
  in ``<loc>`` elements; ``<sitemapindex>`` documents list further sitemaps
  the same way.

This module is the normative definition of what counts as a sitemap
document and which URLs it yields; the oracle simulator and the Spark
engine's extraction path (kernels/textextract.py, gated by
``cfg.sitemaps_enabled``) share it, so both sides agree byte-for-byte.
Parsing is deliberately regex-simple (no XML library): ``<loc>`` content
in document order, surrounding whitespace stripped, the five XML entities
unescaped via ``xml.sax.saxutils.unescape`` plus ``&quot;``/``&apos;`` —
identical on both sides by construction.
"""

from __future__ import annotations

import re
from xml.sax.saxutils import unescape

_LOC = re.compile(r"<loc>\s*([^<]*?)\s*</loc>")
_ENTITIES = {"&quot;": '"', "&apos;": "'"}


def looks_like_sitemap(doc: str | None) -> bool:
    """True iff *doc* (already decoded) is a sitemap/sitemap-index document:
    after leading whitespace, an ``<?xml`` declaration or a bare
    ``<urlset``/``<sitemapindex`` root. HTML pages never match (they start
    with a doctype or ``<html``), so flag-gated sitemap handling can never
    change an HTML page's extraction."""
    if not doc:
        return False
    head = doc.lstrip()[:16].lower()
    return head.startswith(("<?xml", "<urlset", "<sitemapindex"))


def sitemap_locs(doc: str | None) -> list[str]:
    """``<loc>`` URL strings of *doc* in document order (raw — NOT
    canonicalized; callers canonicalize like any discovered href).
    Entity-escaped URLs (``&amp;`` per the sitemap spec) are unescaped."""
    if not doc:
        return []
    return [unescape(m, _ENTITIES) for m in _LOC.findall(doc)]
