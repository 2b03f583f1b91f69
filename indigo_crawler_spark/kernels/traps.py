"""Crawler-trap detection kernel — SEMANTICS.md §Traps.

Web-scale crawls die in URL *traps*: calendar pages, session-id echoes and
self-referential path loops mint unbounded URL families under one host, and
a frontier that admits them spends its politeness budget on garbage forever.
The classic defenses are structural and need no fetch: bound the path depth,
bound how often one path segment may repeat, bound the URL length.

This kernel is the normative definition shared by the oracle simulator and
the Spark column-expression mirror (functions/traps.py); a pytest asserts
the two agree on a URL battery. All three limits are OFF (0) by default —
the gate is a semantic knob, so enabling any limit enters config_hash
(config.py extension-field scheme).

Path parsing is deliberately regex-simple and identical on both sides:
strip ``scheme://authority`` (first match only), then cut at the first
``?``. Canonical URLs (kernels/canonicalize.py) always carry a scheme and
a non-empty path, so this is total on engine inputs.
"""

from __future__ import annotations

import re

_AUTHORITY = re.compile(r"^[a-z]+://[^/]*")


def url_path(canon_url: str) -> str:
    """Path component of a canonical URL (query stripped, no decoding)."""
    p = _AUTHORITY.sub("", canon_url, count=1)
    q = p.find("?")
    return p if q < 0 else p[:q]


def path_segments(canon_url: str) -> list[str]:
    """Non-empty ``/``-separated path segments."""
    return [s for s in url_path(canon_url).split("/") if s]


def max_segment_repeat(canon_url: str) -> int:
    """Occurrence count of the most-repeated path segment (0 for no path)."""
    segs = path_segments(canon_url)
    if not segs:
        return 0
    counts: dict[str, int] = {}
    for s in segs:
        counts[s] = counts.get(s, 0) + 1
    return max(counts.values())


def is_trap_url(
    canon_url: str,
    max_depth: int = 0,
    max_repeat: int = 0,
    max_url_len: int = 0,
) -> bool:
    """True iff *canon_url* trips any ENABLED structural trap limit.

    - ``max_depth`` > 0: more than that many path segments ⇒ trap
      (calendar/deep-mirror families).
    - ``max_repeat`` > 0: any single segment occurring more than that many
      times ⇒ trap (self-referential ``/a/a/a/...`` loops).
    - ``max_url_len`` > 0: URL longer than that many characters ⇒ trap
      (session-id / parameter-echo blowups).

    A limit of 0 disables that check; all-zero means never a trap.
    """
    if max_url_len and len(canon_url) > max_url_len:
        return True
    if max_depth or max_repeat:
        segs = path_segments(canon_url)
        if max_depth and len(segs) > max_depth:
            return True
        if max_repeat and segs:
            counts: dict[str, int] = {}
            for s in segs:
                counts[s] = counts.get(s, 0) + 1
                if counts[s] > max_repeat:
                    return True
    return False


# ---------------------------------------------------------------------------
# Exclude-pattern gate — SEMANTICS.md §Exclude patterns. Operators running
# 10^10-URL crawls always carry deny rules the structural trap limits can't
# express: logout/cart/session links, infinite facet parameters, binary
# mirrors. A pattern list is the standard escape hatch; URLs matching any
# pattern leave the crawl at the gate (and never enter the frontier at
# discovery), exactly the trap gate's two enforcement sites.
#
# Regex dialect: patterns are evaluated with Python `re.search` here, Spark
# `rlike` (Java find()) in the engine, and RE2 in the DuckDB driver oracle —
# all three are UNANCHORED contains-match. Patterns must therefore stay in
# the common dialect subset (literals, char classes, anchors, ., *, +, ?,
# |, (), \d \w \s, {m,n}); no backreferences or lookaround. The identity of
# the Python kernel and the Spark expression is pinned by a pytest battery.
# ---------------------------------------------------------------------------

_EXCLUDE_CACHE: dict[tuple[str, ...], list[re.Pattern[str]]] = {}


def matches_exclude(canon_url: str, patterns: tuple[str, ...]) -> bool:
    """True iff *canon_url* matches ANY exclude pattern (unanchored search).

    Empty *patterns* (the default) never matches. Compiled patterns are
    cached per tuple — the oracle calls this per URL per round.
    """
    if not patterns:
        return False
    compiled = _EXCLUDE_CACHE.get(patterns)
    if compiled is None:
        compiled = [re.compile(p) for p in patterns]
        _EXCLUDE_CACHE[patterns] = compiled
    return any(p.search(canon_url) for p in compiled)


# ---------------------------------------------------------------------------
# Extension deny gate — SEMANTICS.md §Extension deny. An html-only crawler
# has no business scheduling .zip/.jpg/.iso URLs: the fetch yields nothing
# extractable, yet each one burns a politeness slot and a seen-set entry.
# exclude_patterns CAN spell `\.zip$`-style rules, but an extension deny
# list is the standard crawler knob and deserves first-class (cheaper)
# spelling: one regexp_extract + one isin per row instead of one regex scan
# per pattern.
#
# Normative extension rule (shared by oracle, Spark expr and DuckDB oracle
# SQL): ONE regex against the canonical URL's path (query stripped, no
# decoding) — ``[^/]\.([^./]+)$`` — i.e. the extension is the lowercased
# text after the path's final ``.``, provided that tail contains no ``/``
# or further ``.``, the dot is not segment-initial (dot-files like
# ``.htaccess`` carry no extension) and something follows it (``file.``
# carries none). Trailing-slash directory paths (``/dl.zip/``) carry none
# — the slash sits between the dot and end-of-path. Identical semantics
# in Python re, Java regex and RE2 (no lookarounds).
# ---------------------------------------------------------------------------

_EXT_RE = re.compile(r"[^/]\.([^./]+)$")


def url_extension(canon_url: str) -> str:
    """Lowercased file extension of a canonical URL's path ('' when the
    path carries none)."""
    m = _EXT_RE.search(url_path(canon_url))
    return m.group(1).lower() if m else ""


def matches_ext(canon_url: str, extensions: tuple[str, ...]) -> bool:
    """True iff *canon_url*'s extension is in the deny tuple.

    *extensions* entries are lowercase, without the leading dot (the CLI
    normalizes). Empty tuple (the default) never matches; extension-less
    URLs never match (entries are non-empty by construction).
    """
    if not extensions:
        return False
    return url_extension(canon_url) in extensions


# ---------------------------------------------------------------------------
# Host allow-list gate — SEMANTICS.md §Host allow-list. The "stay on these
# sites" knob every site-scoped crawl needs: with a non-empty allow set,
# frontier rows whose canonical host is NOT in the set leave at the gate
# permanently (like robots-denied) and discovered children on non-allowed
# hosts never enter the frontier. Matching is exact string equality against
# the CANONICAL host (already lowercased by canonicalize_url; with
# --collapse-www the operator lists the bare host). The set is
# operator-curated (hundreds–thousands of entries), so a frozenset lookup
# here and a codegen'd isin on the Spark side are the right shapes — a
# corpus-derived allow set of frontier scale would want a semi-join and a
# different knob.
# ---------------------------------------------------------------------------

_ALLOW_CACHE: dict[tuple[str, ...], frozenset[str]] = {}


def host_allowed(host: str, allow_hosts: tuple[str, ...]) -> bool:
    """True iff *host* may be crawled under the allow-list.

    Empty *allow_hosts* (the default) allows every host. Entries are
    lowercase canonical hosts (CrawlConfig validates at construction).
    """
    if not allow_hosts:
        return True
    s = _ALLOW_CACHE.get(allow_hosts)
    if s is None:
        s = frozenset(allow_hosts)
        _ALLOW_CACHE[allow_hosts] = s
    return host in s
