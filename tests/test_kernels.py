"""T0 — pure-Python kernel unit tests (no Spark needed)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from indigo_crawler_spark.kernels.bloom import (
    bloom_build,
    bloom_merge,
    bloom_params,
    bloom_probe,
    bytes_to_words,
    digests_to_array,
    words_to_bytes,
)
from indigo_crawler_spark.kernels.canonicalize import canonicalize_url
from indigo_crawler_spark.kernels.keys import pk_of_host_hash, url_hash
from indigo_crawler_spark.kernels.priority import priority_score
from indigo_crawler_spark.kernels.robots import robots_allowed
from indigo_crawler_spark.kernels.textextract import extract_text_and_links


class TestCanonicalize:
    @pytest.mark.parametrize(
        "raw,expect",
        [
            ("HTTPS://H1.EXAMPLE.ORG:443/./p/123%7e#frag", "https://h1.example.org/p/123~"),
            ("http://a.com", "http://a.com/"),
            ("http://a.com:80/x/../y?q=B%2f&a=1", "http://a.com/y?q=B%2f&a=1"),
            ("https://a.com/%41%2F?", "https://a.com/A%2F"),
            ("https://a.com/a//b/./c/..", "https://a.com/a//b/"),
            ("https://user:p@A.com:8080/", "https://user:p@a.com:8080/"),
            ("  https://a.com  ", "https://a.com/"),
            ("https://a.com/?b=2&a=1", "https://a.com/?b=2&a=1"),  # no param sort
            ("https://a.com/%zz", "https://a.com/%zz"),  # malformed escape kept
        ],
    )
    def test_spec_vectors(self, raw, expect):
        assert canonicalize_url(raw) == expect

    @pytest.mark.parametrize(
        "raw", ["ftp://x.com/a", "", None, "http://", "javascript:void(0)", "  ", "mailto:a@b.c"]
    )
    def test_rejects(self, raw):
        assert canonicalize_url(raw) is None

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def test_total_and_idempotent(self, s):
        c = canonicalize_url(s)
        if c is not None:
            assert canonicalize_url(c) == c  # idempotence

    @given(
        st.sampled_from(["http", "https"]),
        st.from_regex(r"[a-z0-9]{1,10}(\.[a-z]{2,5}){1,2}", fullmatch=True),
        st.from_regex(r"(/[A-Za-z0-9._~%/-]{0,15}){0,3}", fullmatch=True),
    )
    @settings(max_examples=200, deadline=None)
    def test_wellformed_idempotent(self, scheme, host, path):
        u = f"{scheme}://{host}{path}"
        c = canonicalize_url(u)
        assert c is not None
        assert canonicalize_url(c) == c


class TestPriority:
    def test_formula(self):
        # 1/(1+0) + 1/(1+0) + 1/bit_length(1+3)=1/3
        assert priority_score(0, 0, 3) == (1.0 + 1.0) + 1.0 / 3.0
        # non-seed: middle term 0
        assert priority_score(2, None, 0) == (1.0 / 3.0 + 0.0) + 1.0

    def test_monotone_in_depth(self):
        assert priority_score(0, None, 5) > priority_score(1, None, 5)

    @given(st.integers(0, 50), st.one_of(st.none(), st.integers(0, 10**6)), st.integers(0, 10**9))
    @settings(max_examples=200, deadline=None)
    def test_bounded(self, d, s, hc):
        p = priority_score(d, s, hc)
        assert 0.0 < p <= 3.0


class TestKeys:
    def test_url_hash(self):
        u = "https://a.com/"
        assert url_hash(u) == hashlib.sha256(u.encode()).digest()[:16]
        assert len(url_hash(u)) == 16

    def test_pk_pmod(self):
        assert pk_of_host_hash(-3, 256) == 253
        assert pk_of_host_hash(5, 256) == 5
        assert 0 <= pk_of_host_hash(-(2**63), 256) < 256


class TestTextExtract:
    def test_skips_and_blocks(self):
        html = (
            b"<html><head><script>sk<p>ip</p></script><style>s</style></head>"
            b"<body><h1>A</h1><noscript>no</noscript>B <!-- c --> C"
            b"<template><p>t</p></template><p>d   e</p></body></html>"
        )
        text, links = extract_text_and_links(html, "https://a.com/")
        assert text == "A\nB C\nd e"
        assert links == []

    def test_links_relative_and_dupes(self):
        html = b'<a href="/x">1</a><a href="y/z">2</a><a href="/x">3</a><a href="ftp://no">4</a>'
        _, links = extract_text_and_links(html, "https://a.com/b/c")
        assert links == ["https://a.com/x", "https://a.com/b/y/z", "https://a.com/x"]

    def test_invalid_utf8_replace(self):
        text, _ = extract_text_and_links(b"<p>ok</p>\xff", "https://a.com/")
        assert text == "ok\n�"

    def test_none_html(self):
        assert extract_text_and_links(None, "https://a.com/") == ("", [])


class TestBloom:
    def test_params(self):
        m, k = bloom_params(1000, 1e-3)
        assert m % 64 == 0 and m >= 14000 and 1 <= k <= 20

    def test_no_false_negatives_and_fpr(self):
        members = [url_hash(f"https://h{i}.com/p/{i}") for i in range(2000)]
        others = [url_hash(f"https://x{i}.org/q/{i}") for i in range(4000)]
        m, k = bloom_params(len(members), 1e-3)
        words = bloom_build(digests_to_array(members), m, k)
        assert bloom_probe(digests_to_array(members), words, m, k).all()
        fp = bloom_probe(digests_to_array(others), words, m, k).sum()
        assert fp / len(others) < 5e-3

    def test_merge_and_serde(self):
        a = [url_hash(f"a{i}") for i in range(100)]
        b = [url_hash(f"b{i}") for i in range(100)]
        m, k = bloom_params(200, 1e-3)
        wa = bloom_build(digests_to_array(a), m, k)
        wb = bloom_build(digests_to_array(b), m, k)
        merged = bloom_merge(wa, wb)
        rt = bytes_to_words(words_to_bytes(merged))
        assert (rt == merged).all()
        assert bloom_probe(digests_to_array(a + b), rt, m, k).all()

    def test_empty(self):
        m, k = bloom_params(0, 1e-3)
        words = bloom_build(digests_to_array([]), m, k)
        assert bloom_probe(digests_to_array([url_hash("x")]), words, m, k).sum() == 0


class TestRobots:
    def test_allow_deny(self):
        assert robots_allowed("https://a.com/p/1", None)
        assert robots_allowed("https://a.com/p/1", "User-agent: *\nDisallow:")
        assert not robots_allowed("https://a.com/p/1", "User-agent: *\nDisallow: /")
        assert not robots_allowed("https://a.com/p/12", "User-agent: *\nDisallow: /p/1")
        assert robots_allowed("https://a.com/q/1", "User-agent: *\nDisallow: /p/1")
        assert not robots_allowed(
            "https://a.com/p/3", "User-agent: indigo-spark\nDisallow: /p/3"
        )
        assert robots_allowed(
            "https://a.com/p/3",
            "User-agent: indigo-spark\nDisallow: /p/3",
            user_agent="otherbot",
        )
