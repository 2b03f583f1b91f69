"""robots.txt gate kernel — stdlib ``urllib.robotparser``, SEMANTICS.md §Round 1.

The reference validated free proxies before use; the batch analogue is the
per-(host, fetcher) admission gate: robots.txt + politeness budget
(BASELINE.json:6). Hosts without a robots row are allowed. Parsers are cached
per robots_txt within a process — both the oracle loop and each
Arrow-batch worker benefit, and the allow gate and crawl-delay kernels share
parses.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

USER_AGENT = "indigo-spark"

_cache: dict[str, RobotFileParser] = {}


def _parser(host: str, robots_txt: str) -> RobotFileParser:
    # keyed by text alone: parsing depends only on the text, and a text-only
    # key lets the crawl-delay kernel share parses with the allow gate
    key = robots_txt
    rp = _cache.get(key)
    if rp is None:
        rp = RobotFileParser()
        rp.parse(robots_txt.splitlines())
        # after the by-host shuffle each worker sees one partition's hosts,
        # so a 64k cap holds the working set without unbounded growth
        if len(_cache) > 65536:
            _cache.clear()
        _cache[key] = rp
    return rp


def robots_allowed(url: str, robots_txt: str | None, user_agent: str = USER_AGENT) -> bool:
    """True iff *url* may be fetched under *robots_txt* (None ⇒ allow)."""
    if robots_txt is None:
        return True
    try:
        return _parser_url_ok(url, robots_txt, user_agent)
    except Exception:
        return True  # unparseable robots.txt does not block the crawl


def _parser_url_ok(url: str, robots_txt: str, user_agent: str) -> bool:
    from urllib.parse import urlsplit

    host = urlsplit(url).netloc
    return _parser(host, robots_txt).can_fetch(user_agent, url)


def robots_sitemaps(robots_txt: str | None) -> list[str]:
    """``Sitemap:`` directive URLs of *robots_txt* in file order (raw — NOT
    canonicalized), [] when none. SEMANTICS.md §Sitemaps: with
    ``cfg.sitemaps_enabled`` these are injected into the round-0 frontier
    alongside the seed list. stdlib ``robotparser.site_maps()`` semantics
    (directive is agent-independent); same parser cache as the allow gate,
    so bootstrap adds no parses beyond the gate's."""
    if robots_txt is None:
        return []
    try:
        maps = _parser("", robots_txt).site_maps()
        return list(maps) if maps else []
    except Exception:
        return []


def crawl_delay(robots_txt: str | None, user_agent: str = USER_AGENT) -> float | None:
    """Crawl-delay (seconds) robots.txt declares for *user_agent*, else None.

    SEMANTICS.md §Politeness: with ``cfg.round_seconds`` > 0 the engine caps
    a host's per-round budget at max(1, floor(round_seconds / delay)) — the
    batch analogue of sleeping `delay` between sequential fetches. stdlib
    robotparser semantics (agent group match incl. ``*`` fallback);
    unparseable values → None (no cap), same shrug as robots_allowed.
    """
    if robots_txt is None:
        return None
    try:
        # parser cache is keyed (host, text); delay depends on text only —
        # reuse the cache with a sentinel host
        d = _parser("", robots_txt).crawl_delay(user_agent)
        return float(d) if d is not None else None
    except Exception:
        return None
