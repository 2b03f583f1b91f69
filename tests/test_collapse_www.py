"""WWW-host collapse (SEMANTICS.md §WWW collapse): kernel battery incl. the
fixed-point rule, flag-off byte-identity, engine ≡ oracle where www and
non-www spellings of one resource collapse to ONE scheduled fetch, flag-off
schedules them distinctly, composition with tracking-param stripping, and
the hash pin."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.canonicalize import (
    canonicalize_url,
    collapse_www_host,
)
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from oracle.simulator import OracleCrawl


@pytest.mark.parametrize(
    ("host", "want"),
    [
        ("www.example.org", "example.org"),
        ("example.org", "example.org"),
        ("www.www.a.example.org", "a.example.org"),  # ALL labels drop
        ("www.org", "www.org"),  # remainder 'org' has no dot — survives
        ("www.www.org", "www.org"),  # exactly ONE label, then stops
        ("www", "www"),
        ("sub.www.example.org", "sub.www.example.org"),  # not leading
        ("wwwx.example.org", "wwwx.example.org"),  # not the www. label
    ],
)
def test_collapse_www_host_cases(host, want):
    assert collapse_www_host(host) == want


def test_canonicalize_collapse_and_fixed_point():
    # port/userinfo/path/query preserved; only the host labels drop
    assert (
        canonicalize_url("https://user@WWW.Example.org:8443/a/../b?q=1", False, True)
        == "https://user@example.org:8443/b?q=1"
    )
    # IPv6 untouched
    assert (
        canonicalize_url("http://[2001:db8::1]/x", False, True)
        == "http://[2001:db8::1]/x"
    )
    # FIXED POINT: re-canonicalizing a collapsed url is a no-op — the
    # property retire/inject/adaptive-recrawl rely on
    for u in (
        "https://www.www.a.example.org/p?x=1",
        "http://www.www.org/",
        "https://www.h1.example.org/deep/path",
    ):
        c1 = canonicalize_url(u, False, True)
        assert canonicalize_url(c1, False, True) == c1
    # composition with tracking-param stripping: one pass applies both
    assert (
        canonicalize_url(
            "https://www.h3.example.org/p?utm_source=x&id=1", True, True
        )
        == "https://h3.example.org/p?id=1"
    )


def test_flag_off_byte_identity():
    for u in (
        "https://www.example.org/a",
        "HTTPS://WWW.EXAMPLE.ORG:443/a/./b",
        "http://www.www.org/x?y=1#frag",
    ):
        assert canonicalize_url(u) == canonicalize_url(u, False, False)
    # flag-off keeps the www host byte-for-byte
    assert canonicalize_url("https://www.example.org/a") == "https://www.example.org/a"


def _bootstrap(spark, tmp_path, cfg, fb):
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    return state


def _with_www_alias(fb):
    """Add a www-spelled seed duplicating an existing non-www seed's
    resource: under collapse the pair is ONE frontier row; off, two.
    Returns the CANONICAL spellings of both (fixture seeds are messy on
    purpose — uppercase scheme/host, default ports, dot segments)."""
    fb = {k: list(v) for k, v in fb.items()}
    base = canonicalize_url(fb["seeds"][0]["url"])
    assert base is not None and not base.split("://")[1].startswith("www.")
    www = base.replace("://", "://www.", 1)
    fb["seeds"].append({"url": www, "seed_rank": 99})
    return fb, base, www


def _run_both(spark, tmp_path, cfg, fb, n_rounds=2):
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(n_rounds)
    emitted = []
    for r in range(n_rounds):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [(e["canon_url"], e["global_rank"]) for e in results[r].emitted]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        emitted.extend(u for u, _g in got)
    return emitted


def test_collapse_engine_vs_oracle(spark, tmp_path):
    fb0 = fixture_bundle(**TINY)
    fb, base, www = _with_www_alias(fb0)

    # flag ON: one canonical key — the www seed merges into the non-www row
    cfg_on = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        collapse_www_enabled=True,
    )
    emitted_on = _run_both(spark, tmp_path / "on", cfg_on, fb)
    assert emitted_on.count(base) == 1
    assert all(not u.split("://")[1].startswith("www.") for u in emitted_on)

    # flag OFF (positive inertness): the two spellings schedule distinctly
    cfg_off = CrawlConfig(
        round_limit=50, num_buckets=16, bloom_bucket_capacity=64
    )
    emitted_off = _run_both(spark, tmp_path / "off", cfg_off, fb)
    assert base in emitted_off and www in emitted_off


def test_collapse_hash_extension():
    base = CrawlConfig()
    assert "collapse_www_enabled" not in base._hash_dict()
    on = CrawlConfig(collapse_www_enabled=True)
    assert on.config_hash() != base.config_hash()
