"""Trap-URL gate as pure column expressions — mirror of kernels/traps.py.

Stays entirely JVM-side (split / filter / transform / array_max — no Python
worker round-trip), so at 10^10 frontier rows the gate costs one codegen'd
projection, not an Arrow transfer of every URL. The segment-repeat check is
O(k²) in the segment count k, but k is bounded by ``trap_max_depth`` plus a
handful in practice — constant per row.

Identity with the kernel is asserted by tests/test_traps.py over a URL
battery that covers every regex edge (query cut, empty path, repeated
segments, unicode length).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from indigo_crawler_spark.config import CrawlConfig

# same regexes as kernels/traps.py — Java and Python regex semantics agree
# on these patterns (anchored authority strip; first '?' cuts the query
# because the match consumes to end-of-string)
_AUTHORITY_RE = "^[a-z]+://[^/]*"
_QUERY_RE = r"\?.*"


def path_expr(canon_url: Column) -> Column:
    """Path component of a canonical URL (query stripped)."""
    return F.regexp_replace(
        F.regexp_replace(canon_url, _AUTHORITY_RE, ""), _QUERY_RE, ""
    )


def segments_expr(canon_url: Column) -> Column:
    """array<string> of non-empty path segments."""
    return F.filter(F.split(path_expr(canon_url), "/"), lambda s: s != F.lit(""))


def max_repeat_expr(segs: Column) -> Column:
    """Occurrence count of the most-repeated segment (0 for empty array)."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda s: F.size(F.filter(segs, lambda x: x == s)),
            )
        ),
        F.lit(0),
    )


def trap_expr(canon_url: Column, cfg: CrawlConfig) -> Column:
    """Boolean: does *canon_url* trip any enabled limit (kernel semantics)?

    With all limits at their 0 default this folds to ``lit(False)`` — the
    gate costs nothing unless configured.
    """
    checks: list[Column] = []
    if cfg.trap_max_url_len:
        checks.append(F.length(canon_url) > cfg.trap_max_url_len)
    if cfg.trap_max_depth or cfg.trap_max_repeat:
        segs = segments_expr(canon_url)
        if cfg.trap_max_depth:
            checks.append(F.size(segs) > cfg.trap_max_depth)
        if cfg.trap_max_repeat:
            checks.append(max_repeat_expr(segs) > cfg.trap_max_repeat)
    if not checks:
        return F.lit(False)
    out = checks[0]
    for c in checks[1:]:
        out = out | c
    return out

def exclude_expr(canon_url: Column, cfg: CrawlConfig) -> Column:
    """Boolean: does *canon_url* match any ``cfg.exclude_patterns`` regex
    (kernel semantics: unanchored contains-match, kernels/traps.py::
    matches_exclude)? ``rlike`` is Java ``find()`` — identical to the
    kernel's ``re.search`` on the pinned common dialect subset
    (SEMANTICS.md §Exclude patterns). Folds to ``lit(False)`` with the
    empty default — the gate costs nothing unless configured, and the
    enabled cost is one codegen'd regex projection per pattern, never a
    Python round-trip.
    """
    if not cfg.exclude_patterns:
        return F.lit(False)
    out = canon_url.rlike(cfg.exclude_patterns[0])
    for p in cfg.exclude_patterns[1:]:
        out = out | canon_url.rlike(p)
    return out


def url_extension_expr(canon_url: Column) -> Column:
    """Lowercased extension of the canonical URL's path ('' when none) —
    mirror of kernels/traps.url_extension: ONE regex against the path,
    ``[^/]\\.([^./]+)$`` (dot-files, trailing-dot segments and
    trailing-slash directory paths carry none). regexp_extract returns ''
    on no-match, so the expression is total."""
    return F.lower(
        F.regexp_extract(path_expr(canon_url), r"[^/]\.([^./]+)$", 1)
    )


def ext_expr(canon_url: Column, cfg: CrawlConfig) -> Column:
    """Boolean: is *canon_url*'s extension in ``cfg.exclude_extensions``
    (kernel semantics: kernels/traps.py::matches_ext)? Folds to
    ``lit(False)`` with the empty default; enabled cost is one codegen'd
    regexp_extract + set membership per row — cheaper than the pattern
    gate's per-pattern regex scans, and never a Python round-trip.
    Extension-less URLs never match (deny entries are non-empty)."""
    if not cfg.exclude_extensions:
        return F.lit(False)
    return url_extension_expr(canon_url).isin(*cfg.exclude_extensions)


def host_deny_expr(host: Column, cfg: CrawlConfig) -> Column:
    """Boolean: does *host* fall OUTSIDE ``cfg.allow_hosts`` (kernel
    semantics: kernels/traps.py::host_allowed — empty list allows all)?
    Folds to ``lit(False)`` at the empty default; enabled cost is one
    codegen'd set membership per row against the operator-curated literal
    list (the right shape for hundreds–thousands of hosts; a
    frontier-scale allow set would be a different knob with a semi-join).
    True = the row leaves the crawl at the gate, permanently."""
    if not cfg.allow_hosts:
        return F.lit(False)
    return ~host.isin(*cfg.allow_hosts)
