"""The canonicalize fast path may ONLY pass through provable fixed points:
for every URL the predicate accepts, canonicalize_url must return the input
unchanged, and _canon_series must equal the pure kernel map on any mix."""

from __future__ import annotations

import pandas as pd

from indigo_crawler_spark.functions.udfs import _CANON_FIXED_POINT, _canon_series
from indigo_crawler_spark.kernels.canonicalize import canonicalize_url


ADVERSARIAL = [
    "https://h1.example.org/p/123",
    "HTTPS://H1.EXAMPLE.ORG:443/./p/123%7e#frag",
    "https://example.com",                # empty path -> '/': not fixed point
    "https://example.com/",
    "http://example.com:80/x",            # default port strips
    "http://example.com:8080/x",          # non-default port: ':' excluded
    "https://user@h.example/x",           # userinfo
    "https://[2001:db8::1]/x",            # ipv6
    "https://h.example/a/../b",           # dot segments
    "https://h.example/a/./b",
    "https://h.example/a%2Fb",            # percent escapes
    "https://h.example/a%7eb",            # unreserved escape decodes
    "https://h.example/x?b=1&a=2",        # query
    "https://h.example/x#frag",           # fragment
    "https://h.example/x;jsessionid=abc", # path params
    "https://h.example/a.html",           # dots in segment (excluded by charset)
    "https://WWW.Example.com/x",          # uppercase host
    "ftp://h.example/x",                  # non-http scheme
    " https://h.example/x ",              # whitespace strip
    "https://h.example//double//slash/",
    "https://h.example/~user/page",
    "https://h.example/p/123456",
    "",
    None,
    "not a url",
    "https://h.example/%zz",              # malformed escape
    "https://h.example./x",               # trailing-dot label still matches charset
]


def test_accepted_spellings_are_fixed_points():
    for u in ADVERSARIAL:
        if isinstance(u, str) and _CANON_FIXED_POINT.fullmatch(u):
            assert canonicalize_url(u) == u, u


def test_series_equals_pure_kernel_on_mixed_batch():
    s = pd.Series(ADVERSARIAL, dtype="object")
    got = _canon_series(s)
    want = s.map(lambda u: canonicalize_url(u) if isinstance(u, str) else None)
    assert list(got) == list(want)


def test_series_equals_pure_kernel_on_fixture_corpus():
    from fixtures.gen import PagesSpec

    spec = PagesSpec(3000, 150)
    urls = [spec.url(i) for i in range(3000)]
    s = pd.Series(urls, dtype="object")
    got = _canon_series(s)
    want = s.map(canonicalize_url)
    assert list(got) == list(want)
