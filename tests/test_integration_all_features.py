"""Cross-feature integration: ban/backoff feedback + cuckoo filter + forced
skew salting + seen compaction + retirement + kill-and-resume, all ON at
once, engine vs oracle. Catches interactions the per-feature suites can't
(e.g. versioned budgets across a resume, retirement against a compacted
snapshot, salted politeness under backoff-shrunk candidate sets)."""

from __future__ import annotations

import os

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

N1, N2 = 2, 5  # rounds before retire, total rounds


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    from indigo_crawler_spark.operators.retire import retire_urls

    cfg = CrawlConfig(
        round_limit=40,
        num_buckets=16,
        filter_kind="cuckoo",
        bloom_bucket_capacity=64,
        seen_compact_every=2,
        salt_threshold=3,  # force the salted two-phase top-k on most hosts
        num_salts=4,
        ban_every=4,
        backoff_rounds=1,
    )
    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path_factory.mktemp("integ"))), cfg=cfg
    )
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    m_before = run_rounds(spark, state, N1)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N1)

    # retire round-0's emissions mid-crawl
    to_retire = [e["canon_url"] for e in results[0].emitted]
    n_e = retire_urls(
        state, spark.createDataFrame([(u,) for u in to_retire], "url string")
    )
    assert n_e == oc.retire(to_retire) > 0

    m_after = run_rounds(spark, state, N2)  # rounds N1..N2-1, post-retire

    # kill-and-resume: drop the LAST round's manifest (its data files
    # survive) and re-run — the replay happens after the retirement, so it
    # must be bit-exact (replaying a round from BEFORE a retirement is
    # documented as non-reproducible: the seen set changed externally).
    os.remove(state.io.path("manifest", f"round_{N2 - 1:05d}.json"))
    m_replayed = run_rounds(spark, state, N2)
    assert m_replayed == [m_after[-1]]

    manifests = m_before + m_after
    results += [oc.step(r) for r in range(N1, N2)]
    return state, manifests, oc, results


def test_everything_on_ordering_exact(crawl):
    state, _, _, results = crawl
    for r in range(N2):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["global_rank"], row["status"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert got == want, f"round {r}"


def test_everything_on_counters_exact(crawl):
    _, manifests, _, results = crawl
    for r in range(N2):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
    # the scenario is non-degenerate: bans, backoffs and retire-reemissions occur
    assert sum(m["counters"]["banned"] for m in manifests) > 0
    assert sum(m["counters"]["backoff_skipped"] for m in manifests) > 0


def test_everything_on_seen_exact(crawl):
    state, _, oc, _ = crawl
    got = {
        (row["canon_url"], row["first_round"])
        for row in state.seen_through(N2).collect()
    }
    assert got == set(oc.seen.items())


def test_everything_on_budgets_exact(crawl):
    state, _, oc, _ = crawl
    cfg = state.cfg
    df = state.io.read(f"host_budgets/round={N2}", schemas.HOST_BUDGETS)
    got = {(r["host"], r["budget"], r["backoff_until_round"]) for r in df.collect()}
    hosts = set(oc.budget) | set(oc.backoff)
    want = {
        (h, oc.budget.get(h, cfg.default_budget), oc.backoff.get(h, 0))
        for h in hosts
    }
    assert got == want
