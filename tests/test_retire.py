"""Retire → re-crawl, end-to-end: engine (cuckoo deletion + retired table)
vs oracle (seen-set removal). A URL emitted early is retired between rounds;
when the link graph rediscovers it, BOTH sides re-emit it identically —
ordering, seen set and counters stay bit-equal after the mutation."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
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

N_BEFORE = 2
N_TOTAL = 5


@pytest.fixture(scope="module", params=["cuckoo", "bloom"])
def crawl(spark, tmp_path_factory, request):
    from indigo_crawler_spark.operators.retire import retire_urls

    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        filter_kind=request.param,
        bloom_bucket_capacity=64,
    )
    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path_factory.mktemp("retire"))), cfg=cfg
    )
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests_before = run_rounds(spark, state, N_BEFORE)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_BEFORE)

    # retire everything emitted in round 0 (plus an unknown url = no-op)
    to_retire = [e["canon_url"] for e in results[0].emitted] + [
        "https://never-seen.example.com/x"
    ]
    n_engine = retire_urls(
        state, spark.createDataFrame([(u,) for u in to_retire], "url string")
    )
    n_oracle = oc.retire(to_retire)
    assert n_engine == n_oracle > 0

    manifests = manifests_before + run_rounds(spark, state, N_TOTAL)
    results += [oc.step(r) for r in range(N_BEFORE, N_TOTAL)]
    return state, manifests, oc, results, set(to_retire)


def test_retired_urls_reemitted(crawl):
    _, _, _, results, retired = crawl
    re_emitted = {
        e["canon_url"]
        for rr in results[N_BEFORE:]
        for e in rr.emitted
        if e["canon_url"] in retired
    }
    assert re_emitted, "fixture must rediscover at least one retired url"


def test_ordering_exact_after_retire(crawl):
    state, _, _, results, _ = crawl
    for r in range(N_BEFORE, N_TOTAL):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [(e["canon_url"], e["global_rank"]) for e in results[r].emitted]
        assert got == want, f"round {r}"


def test_seen_set_exact_after_retire(crawl):
    state, _, oc, _, _ = crawl
    got = {
        (row["canon_url"], row["first_round"])
        for row in state.seen_through(N_TOTAL).collect()
    }
    assert got == set(oc.seen.items())


def test_counters_exact_after_retire(crawl):
    _, manifests, _, results, _ = crawl
    for r in range(N_BEFORE, N_TOTAL):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
