"""Frontier-derived heavy-host salting (the link-farm blind spot, VERDICT r2 #1).

A host with only 2 corpus pages (never heavy by bootstrap page count)
accumulates 30 frontier candidates via discovered links. The round after it
first turns heavy, the engine must (a) record it in the frontier-derived
skew dimension, (b) route its politeness window through the salted two-phase
path, and (c) stay bit-identical to the oracle — salting is purely physical.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

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

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
FARM = "farm.example.org"
N_FARM_LINKS = 30
N_ROUNDS = 3


def _page(url: str, i: int, links: list[str]) -> dict:
    anchors = "".join(f'<a href="{u}">a</a>' for u in links)
    return {
        "url": url,
        "warc_ts": _EPOCH + timedelta(seconds=i),
        "html": f"<html><body><h1>P{i}</h1>{anchors}<p>t {i}</p></body></html>".encode(),
        "text": None,
        "lang": "en",
    }


def _fixture() -> dict:
    farm_urls = [f"https://{FARM}/f{j:02d}" for j in range(N_FARM_LINKS)]
    pages, seeds = [], []
    # 3 seed hosts, one page each — every seed page links to ALL farm urls
    for i, h in enumerate(("a.example.org", "b.example.org", "c.example.org")):
        u = f"https://{h}/"
        pages.append(_page(u, i, farm_urls))
        seeds.append({"url": u, "seed_rank": i})
    # the farm has only TWO corpus pages → never heavy by page count
    pages.append(_page(farm_urls[0], 100, []))
    pages.append(_page(farm_urls[1], 101, []))
    return {"pages": pages, "seeds": seeds, "robots": [], "host_budgets": []}


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    cfg = CrawlConfig(
        round_limit=100,
        num_buckets=8,
        default_budget=5,  # << N_FARM_LINKS so farm rows persist across rounds
        salt_threshold=10,  # > farm page count (2), < farm candidate count (30)
        num_salts=4,
    )
    fb = _fixture()
    state = CrawlState(io=TableIO(spark, str(tmp_path_factory.mktemp("fskew"))), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, N_ROUNDS)
    oracle = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    return state, manifests, oracle, oracle.run(N_ROUNDS)


def test_farm_not_heavy_at_bootstrap(crawl):
    state, _, _, _ = crawl
    assert (state.io.read_manifest("bootstrap") or {})["n_heavy_hosts"] == 0
    assert state.heavy_hosts(0) is None  # round 0 takes the plain window


def test_frontier_fold_detects_farm(crawl):
    state, manifests, _, _ = crawl
    # round 1's gate frame is the 30 discovered farm urls
    assert manifests[1]["counters"]["max_host_candidates"] == N_FARM_LINKS
    assert manifests[1]["counters"]["frontier_heavy_hosts_next"] == 1
    rows = state.io.read(
        "heavy_hosts_frontier/round=2", schemas.HEAVY_HOSTS
    ).collect()
    assert {r["host"] for r in rows} == {FARM}
    # round 2 therefore runs with a non-empty heavy dimension (salted path)
    heavy = state.heavy_hosts(2)
    assert heavy is not None
    assert {r["host"] for r in heavy.collect()} == {FARM}


def test_salted_round_output_identical_to_oracle(crawl):
    state, _, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["rank_in_host"], row["priority"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["priority"])
            for e in oracle_results[r].emitted
        ]
        assert got == want, f"round {r}"
    # round 2 (the salted round) actually emitted farm rows
    assert any(e["host"] == FARM for e in oracle_results[2].emitted)


def test_counters_exact_with_skew_fold(crawl):
    _, manifests, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == oracle_results[r].counters, f"round {r}"
