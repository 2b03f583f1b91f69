"""T2 — the acceptance gate (BASELINE.json:2,15):

identical crawl ordering (list equality), identical URL-seen set (set
equality), byte-identical extracted text per url, identical counters —
Spark engine vs the pure-Python oracle, multi-round, on the tiny fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


@pytest.fixture(scope="module", params=["bloom", "none", "salted", "cuckoo"])
def crawl(spark, tmp_path_factory, request):
    # bloom_bucket_capacity=32 deliberately undersizes the bitmaps so false
    # positives occur and the exact anti-join backstop is actually exercised;
    # "salted" forces the two-phase heavy-host top-k on nearly every host.
    # Results must be identical in all variants (perf layers are transparent).
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        filter_kind="bloom" if request.param == "salted" else request.param,
        bloom_bucket_capacity=32,
        salt_threshold=3 if request.param == "salted" else 10_000,
        num_salts=4,
    )
    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path_factory.mktemp("crawl"))), cfg=cfg
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
    oc = OracleCrawl(
        fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg
    )
    oracle_results = oc.run(N_ROUNDS)
    return state, manifests, oc, oracle_results


def _engine_ordering(state, r):
    df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
    return [
        (row["canon_url"], row["batch_id"], row["rank_in_host"], row["priority"])
        for row in df.orderBy("global_rank").collect()
    ]


def test_crawl_ordering_exact(crawl):
    state, _, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        got = _engine_ordering(state, r)
        want = [
            (e["canon_url"], e["batch_id"], e["rank_in_host"], e["priority"])
            for e in oracle_results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"


def test_seen_set_exact(crawl):
    state, _, oc, _ = crawl
    seen_df = state.seen_through(N_ROUNDS)
    got = {
        (row["canon_url"], row["first_round"]) for row in seen_df.collect()
    }
    assert got == set(oc.seen.items())


def test_extracted_text_byte_identical(crawl):
    state, _, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        df = state.io.read(f"fetched_text/round={r}", schemas.FETCHED_TEXT)
        got = {row["canon_url"]: row["text"] for row in df.collect()}
        assert got == oracle_results[r].texts, f"text mismatch at round {r}"


def test_counters_match(crawl):
    _, manifests, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == oracle_results[r].counters, f"round {r}"


def test_round_metrics_rollup(crawl):
    """A7 engine-side rollup(host, status) table == oracle mirror."""
    state, _, _, oracle_results = crawl
    for r in range(N_ROUNDS):
        df = state.io.read(f"round_metrics/round={r}", schemas.ROUND_METRICS)
        got = {(row["host"], row["status"]): row["n"] for row in df.collect()}
        assert got == oracle_results[r].metrics, f"round {r}"


def test_frontier_matches_oracle(crawl):
    state, _, oc, _ = crawl
    df = state.io.read(f"frontier/round={N_ROUNDS}", schemas.FRONTIER)
    got = {
        row["canon_url"]: (
            row["depth"], row["seed_rank"], row["priority"], row["discovered_round"]
        )
        for row in df.collect()
    }
    want = {
        u: (fr.depth, fr.seed_rank, fr.priority, fr.discovered_round)
        for u, fr in oc.frontier.items()
    }
    assert got == want
