"""Sitemap discovery (SEMANTICS.md §Sitemaps, default OFF):

- kernel semantics: sitemap detection, <loc> parsing + entity unescape,
  robots Sitemap: directive extraction;
- flag gating: sitemap handling is invisible when off, and HTML pages are
  byte-identical under both flag values;
- engine ≡ oracle crawl with robots-declared sitemaps, a sitemapindex
  chain, and sitemap-only pages that must get crawled;
- config_hash extension behaviour.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.robots import robots_sitemaps
from indigo_crawler_spark.kernels.sitemap import looks_like_sitemap, sitemap_locs
from indigo_crawler_spark.kernels.textextract import extract_text_and_links
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

_TS = datetime(2023, 12, 31, tzinfo=timezone.utc)

SITEMAP_XML = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b"  <url><loc>https://h1.example.org/only-in-sitemap</loc></url>\n"
    b"  <url><loc> https://h1.example.org/p/237697 </loc></url>\n"
    b"  <url><loc>https://h1.example.org/q?a=1&amp;b=2</loc></url>\n"
    b"</urlset>\n"
)

SITEMAP_INDEX = (
    b"<sitemapindex>\n"
    b"  <sitemap><loc>https://h2.example.org/sub-sitemap.xml</loc></sitemap>\n"
    b"</sitemapindex>\n"
)

SUB_SITEMAP = (
    b"<urlset><url><loc>https://h2.example.org/from-sub-sitemap</loc></url></urlset>"
)

HTML_PAGE = (
    b"<html><body><p>plain words</p>"
    b'<a href="https://h1.example.org/linked">x</a></body></html>'
)


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_kernel_detection_and_locs():
    assert looks_like_sitemap('<?xml version="1.0"?><urlset>')
    assert looks_like_sitemap("  \n<urlset>")
    assert looks_like_sitemap("<SITEMAPINDEX>")
    assert not looks_like_sitemap("<!DOCTYPE html><html>")
    assert not looks_like_sitemap("<html><body>")
    assert not looks_like_sitemap("")
    assert not looks_like_sitemap(None)
    doc = SITEMAP_XML.decode()
    assert sitemap_locs(doc) == [
        "https://h1.example.org/only-in-sitemap",
        "https://h1.example.org/p/237697",
        "https://h1.example.org/q?a=1&b=2",  # &amp; unescaped
    ]
    assert sitemap_locs("") == []
    assert sitemap_locs(None) == []


def test_robots_sitemaps_directive():
    txt = (
        "Sitemap: https://h1.example.org/sitemap.xml\n"
        "User-agent: *\nDisallow: /p/1\n"
        "sitemap: https://h1.example.org/sitemap2.xml\n"
    )
    assert robots_sitemaps(txt) == [
        "https://h1.example.org/sitemap.xml",
        "https://h1.example.org/sitemap2.xml",
    ]
    assert robots_sitemaps("User-agent: *\nDisallow:") == []
    assert robots_sitemaps(None) == []


def test_extract_flag_gating():
    # flag off: the XML goes through the HTML parser — loc text is visible
    # text, no hrefs
    t_off, l_off = extract_text_and_links(SITEMAP_XML, "https://h1.example.org/s")
    assert "only-in-sitemap" in t_off and l_off == []
    # flag on: sitemap branch — empty text, canonical locs in order
    t_on, l_on = extract_text_and_links(
        SITEMAP_XML, "https://h1.example.org/s", sitemap_aware=True
    )
    assert t_on == ""
    assert l_on == [
        "https://h1.example.org/only-in-sitemap",
        "https://h1.example.org/p/237697",
        "https://h1.example.org/q?a=1&b=2",
    ]
    # HTML pages: byte-identical under both flag values
    assert extract_text_and_links(HTML_PAGE, "https://h1.example.org/") == (
        extract_text_and_links(HTML_PAGE, "https://h1.example.org/", True)
    )


# ---------------------------------------------------------------------------
# engine vs oracle
# ---------------------------------------------------------------------------
def _sitemap_bundle():
    """TINY plus: h1's robots declares a sitemap (urlset listing a
    sitemap-only page, an existing corpus page, and a query URL) and h2's
    declares a sitemapindex chaining to a sub-sitemap with one more
    sitemap-only page. All four sitemap docs exist as corpus pages."""
    fb = fixture_bundle(**TINY)
    robots = []
    for row in fb["robots"]:
        if row["host"] == "h1.example.org":
            row = {
                **row,
                "robots_txt": "Sitemap: https://h1.example.org/sitemap.xml\n"
                + row["robots_txt"],
            }
        elif row["host"] == "h2.example.org":
            row = {
                **row,
                "robots_txt": row["robots_txt"]
                + "\nSitemap: https://h2.example.org/index-sitemap.xml",
            }
        robots.append(row)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page("https://h1.example.org/sitemap.xml", SITEMAP_XML),
        page("https://h2.example.org/index-sitemap.xml", SITEMAP_INDEX),
        page("https://h2.example.org/sub-sitemap.xml", SUB_SITEMAP),
        page("https://h2.example.org/from-sub-sitemap", HTML_PAGE),
        page("https://h1.example.org/only-in-sitemap", HTML_PAGE),
    ]
    return {**fb, "robots": robots, "pages": pages}


def test_sitemaps_engine_vs_oracle(spark, tmp_path):
    fb = _sitemap_bundle()
    cfg = CrawlConfig(round_limit=50, num_buckets=16, sitemaps_enabled=True)
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bpayload = bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, 4)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(4)

    assert bpayload["sitemap_seed_urls"] == oc.sitemap_seed_urls == 2
    emitted_all = []
    for r in range(4):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["rank_in_host"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        emitted_all += [u for u, _, _ in got]

    # the sitemap docs themselves were scheduled (frontier rows from robots)
    assert "https://h1.example.org/sitemap.xml" in emitted_all
    assert "https://h2.example.org/index-sitemap.xml" in emitted_all
    # the index chained: sub-sitemap fetched, then its page crawled
    assert "https://h2.example.org/sub-sitemap.xml" in emitted_all
    assert "https://h2.example.org/from-sub-sitemap" in emitted_all
    # a page reachable ONLY through the sitemap got crawled
    assert "https://h1.example.org/only-in-sitemap" in emitted_all
    # sitemap docs record empty extracted text (engine side, byte-identity)
    texts = {
        row["canon_url"]: row["text"]
        for r in range(4)
        for row in state.io.read(
            f"fetched_text/round={r}", schemas.FETCHED_TEXT
        ).collect()
    }
    assert texts["https://h1.example.org/sitemap.xml"] == ""
    assert texts["https://h1.example.org/only-in-sitemap"] != ""


def test_flag_off_is_unchanged(spark, tmp_path):
    """The same bundle with sitemaps_enabled=False behaves exactly like a
    crawl that never heard of sitemaps: directive URLs stay out of the
    frontier and the sitemap page bodies parse as (weird) HTML."""
    fb = _sitemap_bundle()
    cfg = CrawlConfig(round_limit=50, num_buckets=16)
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bpayload = bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, 3)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(3)
    assert bpayload["sitemap_seed_urls"] == 0
    for r in range(3):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [row["canon_url"] for row in df.orderBy("global_rank").collect()]
        want = [e["canon_url"] for e in results[r].emitted]
        assert got == want
        assert manifests[r]["counters"] == results[r].counters
        assert "https://h1.example.org/sitemap.xml" not in got


def test_config_hash_sitemap_extension():
    base = CrawlConfig()
    assert "sitemaps_enabled" not in base._hash_dict()
    on = CrawlConfig(sitemaps_enabled=True)
    assert on.config_hash() != base.config_hash()
    assert on.config_hash_legacy(1024) != base.config_hash_legacy(1024)
