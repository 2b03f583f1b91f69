"""HTML → (visible text, out-links) kernel — SEMANTICS.md §Text + link extraction.

stdlib ``html.parser`` only (bs4/lxml absent in the sandbox — SURVEY.md §0).
One parse pass produces both the extracted text (byte-identity invariant,
BASELINE.json:15) and the anchor hrefs in document order. The Spark engine
runs this inside ``mapInPandas`` batches; the oracle calls it per page.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin

from indigo_crawler_spark.kernels.canonicalize import canonicalize_url

_SKIP_TAGS = frozenset(("script", "style", "noscript", "template"))
_BLOCK_TAGS = frozenset(
    (
        "p", "div", "li", "br",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "tr", "section", "article", "header", "footer",
        "blockquote", "pre", "table",
    )
)


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._chunks: list[str] = []
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if self._skip_depth:
            return
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if self._skip_depth:
            return
        if tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_startendtag(self, tag, attrs):
        # void elements (<br/>): start-side behaviour only
        self.handle_starttag(tag, attrs)

    def handle_data(self, data):
        if not self._skip_depth and data:
            self._chunks.append(data)

    def text(self) -> str:
        lines = "".join(self._chunks).split("\n")
        out = [" ".join(ln.split()) for ln in lines]
        return "\n".join(ln for ln in out if ln)


def extract_text_and_links(
    html: bytes | str | None, base_url: str | None
) -> tuple[str, list[str]]:
    """Parse *html* once; return (visible_text, canonical out-links in order).

    *html* is the binary column decoded UTF-8 ``errors='replace'``. Links are
    ``urljoin(base_url, href)`` → ``canonicalize_url``; rejects are dropped;
    duplicates are preserved (in-round dedup happens downstream, A2).
    """
    if html is None:
        return "", []
    if isinstance(html, (bytes, bytearray, memoryview)):
        doc = bytes(html).decode("utf-8", errors="replace")
    else:
        doc = html
    p = _Extractor()
    try:
        p.feed(doc)
        p.close()
    except Exception:
        # html.parser is tolerant; a hard failure yields whatever was collected
        pass
    links: list[str] = []
    for href in p.hrefs:
        h = href.strip()
        if not h:
            continue
        try:
            absu = urljoin(base_url or "", h)
        except ValueError:
            continue
        c = canonicalize_url(absu)
        if c is not None:
            links.append(c)
    return p.text(), links
