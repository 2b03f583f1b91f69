"""Edge probes — degenerate configs a real operator hits: a zero round
limit, a deny-all robots host, junk/empty seeds, invalid UTF-8 html. Engine
must match the oracle (or degrade loudly), never crash or silently diverge."""

from __future__ import annotations

from datetime import datetime, timezone

from indigo_crawler_spark.config import CrawlConfig
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

_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _page(url, html, lang="en"):
    return {"url": url, "warc_ts": _T0, "html": html, "text": None, "lang": lang}


def _crawl(spark, tmp_path, cfg, pages, seeds, robots, budgets, n_rounds):
    state = CrawlState(io=TableIO(spark, str(tmp_path / "s")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, pages),
        seeds_df(spark, seeds),
        robots_df(spark, robots),
        budgets_df(spark, budgets),
        state,
    )
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(pages, seeds, robots, budgets, cfg)
    return state, manifests, oc.run(n_rounds), oc


def test_round_limit_zero_emits_nothing(spark, tmp_path):
    cfg = CrawlConfig(round_limit=0, num_buckets=8)
    pages = [_page("https://a.example/p", b"<html><p>x</p></html>")]
    seeds = [{"url": "https://a.example/p", "seed_rank": 0}]
    state, manifests, oracle, _ = _crawl(spark, tmp_path, cfg, pages, seeds, [], [], 2)
    for r in range(2):
        assert manifests[r]["counters"]["emitted"] == 0
        assert manifests[r]["counters"] == oracle[r].counters
        assert (
            state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES).count()
            == 0
        )
    # nothing ever leaves the frontier
    assert state.io.read("frontier/round=2", schemas.FRONTIER).count() == 1


def test_deny_all_robots_host(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=8)
    pages = [
        _page("https://closed.example/p", b"<html><p>c</p></html>"),
        _page("https://open.example/p", b"<html><p>o</p></html>"),
    ]
    seeds = [
        {"url": "https://closed.example/p", "seed_rank": 0},
        {"url": "https://open.example/p", "seed_rank": 1},
    ]
    robots = [
        {
            "host": "closed.example",
            "host_hash": 0,
            "robots_txt": "User-agent: *\nDisallow: /\n",
            "fetched_ts": _T0,
        }
    ]
    state, manifests, oracle, _ = _crawl(
        spark, tmp_path, cfg, pages, seeds, robots, [], 1
    )
    assert manifests[0]["counters"]["robots_denied"] == 1
    assert manifests[0]["counters"] == oracle[0].counters
    emitted = [
        r["canon_url"]
        for r in state.io.read("fetch_batches/round=0", schemas.FETCH_BATCHES).collect()
    ]
    assert emitted == ["https://open.example/p"]
    # denied row left the frontier permanently
    assert state.io.read("frontier/round=1", schemas.FRONTIER).count() == 0


def test_junk_and_empty_seeds_quarantined(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=8)
    pages = [_page("https://ok.example/p", b"<html><p>x</p></html>")]
    seeds = [
        {"url": "https://ok.example/p", "seed_rank": 0},
        {"url": "not a url at all", "seed_rank": 1},
        {"url": "ftp://wrong.scheme/x", "seed_rank": 2},
        {"url": "", "seed_rank": 3},
    ]
    state = CrawlState(io=TableIO(spark, str(tmp_path / "q")), cfg=cfg)
    payload = bootstrap(
        spark,
        pages_df(spark, pages),
        seeds_df(spark, seeds),
        robots_df(spark, []),
        budgets_df(spark, []),
        state,
    )
    oc = OracleCrawl(pages, seeds, [], [], cfg)
    assert payload["quarantined_seeds"] == oc.quarantined_seeds == 3
    assert state.io.read("frontier/round=0", schemas.FRONTIER).count() == 1


def test_invalid_utf8_html_byte_identical(spark, tmp_path):
    """errors='replace' decoding must round-trip identically through the
    Arrow extractor and the oracle."""
    cfg = CrawlConfig(round_limit=50, num_buckets=8)
    bad = b"<html><p>ok \xff\xfe broken</p></html>"
    pages = [_page("https://b.example/p", bad)]
    seeds = [{"url": "https://b.example/p", "seed_rank": 0}]
    state, manifests, oracle, _ = _crawl(spark, tmp_path, cfg, pages, seeds, [], [], 1)
    texts = {
        r["canon_url"]: r["text"]
        for r in state.io.read("fetched_text/round=0", schemas.FETCHED_TEXT).collect()
    }
    assert texts == oracle[0].texts
    assert "�" in texts["https://b.example/p"]
