"""EP3 closed-loop backoff — engine vs oracle under synthetic ban outcomes.

The reference demotes/backs off on ban responses; here the deterministic
stand-in outcome (banned ⇔ pmod(xxhash64(canon_url), ban_every) == 0) feeds
``host_budgets/round=R+1`` and must gate round R+1 identically in the Spark
engine and the pure-Python oracle: same ordering, same counters (incl.
``banned``/``backoff_skipped``), same budgets table after N rounds.
"""

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

N_ROUNDS = 4


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    cfg = CrawlConfig(
        round_limit=50, num_buckets=16, ban_every=3, backoff_rounds=1
    )
    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path_factory.mktemp("ban"))), cfg=cfg
    )
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    return state, manifests, oc, oc.run(N_ROUNDS)


def test_bans_occur_and_gate(crawl):
    _, manifests, _, _ = crawl
    assert sum(m["counters"]["banned"] for m in manifests) > 0
    # a banned host is actually skipped in a later round
    assert sum(m["counters"]["backoff_skipped"] for m in manifests) > 0


def test_ordering_and_status_exact(crawl):
    state, _, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["global_rank"], row["status"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["global_rank"], e["status"])
            for e in oracle_results[r].emitted
        ]
        assert got == want, f"round {r}"


def test_counters_exact(crawl):
    _, manifests, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == oracle_results[r].counters, f"round {r}"


def test_budgets_table_matches_oracle(crawl):
    state, _, oc, _ = crawl
    cfg = state.cfg
    df = state.io.read(f"host_budgets/round={N_ROUNDS}", schemas.HOST_BUDGETS)
    got = {
        (r["host"], r["budget"], r["backoff_until_round"]) for r in df.collect()
    }
    hosts = set(oc.budget) | set(oc.backoff)
    want = {
        (h, oc.budget.get(h, cfg.default_budget), oc.backoff.get(h, 0))
        for h in hosts
    }
    assert got == want
