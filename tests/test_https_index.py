"""HTTPS preference + index collapse (SEMANTICS.md §HTTPS preference /
§Index collapse): kernel batteries incl. the pinned port-then-upgrade
order and final-segment-only rule, flag-off byte-identity, engine ≡ oracle
where protocol / default-document spellings of one resource collapse to
ONE scheduled fetch, flag-off schedules them distinctly, six-flag
composition, and the hash pins."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.canonicalize import (
    INDEX_DOCS,
    canonicalize_url,
    collapse_index_path,
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

PH = dict(prefer_https=True)
CI = dict(collapse_index=True)


@pytest.mark.parametrize(
    ("url", "want"),
    [
        # default-port rule evaluates against the ORIGINAL scheme, THEN
        # the scheme upgrades — the pinned order
        ("http://h.example.org/x", "https://h.example.org/x"),
        ("http://h.example.org:80/x", "https://h.example.org/x"),
        ("http://h.example.org:8080/x", "https://h.example.org:8080/x"),
        ("http://h.example.org:443/x", "https://h.example.org:443/x"),
        ("https://h.example.org/x", "https://h.example.org/x"),
        ("https://h.example.org:443/x", "https://h.example.org/x"),
    ],
)
def test_prefer_https_cases(url, want):
    assert canonicalize_url(url, **PH) == want


@pytest.mark.parametrize(
    ("path", "want"),
    [
        ("/a/index.html", "/a/"),
        ("/index.html", "/"),
        ("/a/INDEX.HTML", "/a/"),  # final segment compares lowercased
        ("/a/default.aspx", "/a/"),
        ("/a/index.html/b", "/a/index.html/b"),  # non-final survives
        ("/a/indexx.html", "/a/indexx.html"),  # not in the pinned set
        ("/a/", "/a/"),  # already a directory — fixed point
        ("/a/index.json", "/a/index.json"),
    ],
)
def test_collapse_index_path_cases(path, want):
    assert collapse_index_path(path) == want


def test_index_docs_set_pinned():
    assert INDEX_DOCS == frozenset(
        {
            "index.html",
            "index.htm",
            "index.php",
            "index.asp",
            "index.aspx",
            "default.htm",
            "default.html",
            "default.asp",
            "default.aspx",
        }
    )


def test_canonicalize_composition_and_fixed_points():
    # index collapse through the full kernel, incl. the root case
    assert (
        canonicalize_url("https://E.org/a/Index.HTML?x=1", **CI)
        == "https://e.org/a/?x=1"
    )
    assert canonicalize_url("https://e.org/index.html", **CI) == "https://e.org/"
    # all six flags compose: session-strip -> tracking-strip -> sort on the
    # query; www-collapse + https-upgrade on authority; index-drop on path
    assert (
        canonicalize_url(
            "http://www.h.example.org:80/a/index.html;jsessionid=S"
            "?z=1&utm_source=t&PHPSESSID=v&a=2",
            True,
            True,
            True,
            True,
            True,
            True,
        )
        == "https://h.example.org/a/?a=2&z=1"
    )
    # FIXED POINTS under each new flag
    for u, kw in (
        ("http://h.example.org:8080/x?b=1&a=2", PH),
        ("https://e.org/a/index.html", CI),
    ):
        c1 = canonicalize_url(u, **kw)
        assert canonicalize_url(c1, **kw) == c1


def test_flag_off_byte_identity():
    for u in (
        "http://h.example.org:8080/x",
        "https://e.org/a/index.html",
        "http://e.org/index.php?a=1",
    ):
        assert canonicalize_url(u) == canonicalize_url(
            u, False, False, False, False, False, False
        )
    assert (
        canonicalize_url("http://e.org/a/index.html")
        == "http://e.org/a/index.html"
    )


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


def _with_alias(fb, alias_of_first_seed):
    """Add *alias_of_first_seed(base) -> alias url* as a 99-ranked seed and
    give the store a fetchable row under the alias spelling."""
    fb = {k: list(v) for k, v in fb.items()}
    base = canonicalize_url(fb["seeds"][0]["url"])
    assert base is not None
    alias = alias_of_first_seed(base)
    fb["seeds"].append({"url": alias, "seed_rank": 99})
    page0 = next(
        (p for p in fb["pages"] if canonicalize_url(p["url"]) == base), None
    )
    if page0 is not None:
        fb["pages"].append(dict(page0, url=alias))
    else:
        fb["pages"].append(
            {
                "url": alias,
                "warc_ts": fb["pages"][0]["warc_ts"],
                "html": b"<html><body>i</body></html>",
                "text": None,
                "lang": "en",
            }
        )
    return fb, base, alias


def test_prefer_https_engine_vs_oracle(spark, tmp_path):
    # fixture seeds are https; alias the first one as plain http
    fb0 = fixture_bundle(**TINY)
    fb, base, alias = _with_alias(
        fb0, lambda b: "http://" + b.partition("://")[2]
    )
    assert base.startswith("https://")

    cfg_on = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        prefer_https_enabled=True,
    )
    emitted_on = _run_both(spark, tmp_path / "on", cfg_on, fb)
    assert emitted_on.count(base) == 1
    assert all(u.startswith("https://") for u in emitted_on)

    cfg_off = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    emitted_off = _run_both(spark, tmp_path / "off", cfg_off, fb)
    assert base in emitted_off and canonicalize_url(alias) in emitted_off


def test_collapse_index_engine_vs_oracle(spark, tmp_path):
    fb0 = fixture_bundle(**TINY)
    fb, base, alias = _with_alias(
        fb0, lambda b: b.rstrip("/") + "/index.html"
    )
    collapsed = canonicalize_url(alias, collapse_index=True)

    cfg_on = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        collapse_index_enabled=True,
    )
    emitted_on = _run_both(spark, tmp_path / "on", cfg_on, fb)
    assert collapsed in emitted_on
    assert canonicalize_url(alias) not in emitted_on
    assert all(not u.lower().endswith("/index.html") for u in emitted_on)

    cfg_off = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    emitted_off = _run_both(spark, tmp_path / "off", cfg_off, fb)
    assert canonicalize_url(alias) in emitted_off


def test_hash_extensions():
    base = CrawlConfig()
    for field in ("prefer_https_enabled", "collapse_index_enabled"):
        assert field not in base._hash_dict()
        on = CrawlConfig(**{field: True})
        assert on.config_hash() != base.config_hash()
