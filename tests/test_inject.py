"""Mid-crawl seed injection, end-to-end: engine (``injected/round=R`` side
table unioned by ``CrawlState.frontier``) vs oracle (frontier-dict insert).

A batch mixing genuinely new urls, a url on a host the crawl has never
seen, an already-emitted url, a url already pending in the frontier, a
junk url and an in-batch duplicate is injected between rounds 2 and 3;
both sides must admit the SAME subset, schedule it identically in the
following rounds, and stay bit-equal on ordering / seen set / counters.
A retire → inject sequence re-crawls the url (the operational re-queue),
and GC reclaims the side table once its round commits.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.operators.inject import inject_seeds
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


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path_factory.mktemp("inject"))), cfg=cfg
    )
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, N_BEFORE)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_BEFORE)

    # derive the mixed batch from the oracle's state so it stays meaningful
    # if the fixture generator changes: store urls that are neither seen nor
    # pending are the genuinely-new part (robots-allowed only — denied urls
    # DO inject on both sides, but would be gated out again, starving the
    # "actually scheduled" assertion below)
    from indigo_crawler_spark.kernels.robots import robots_allowed
    from oracle.simulator import _host_of

    new_urls = sorted(
        c
        for c in oc.store
        if c not in oc.seen
        and c not in oc.frontier
        and robots_allowed(c, oc.robots.get(_host_of(c)), cfg.user_agent)
    )[:6]
    assert len(new_urls) >= 2, "fixture must leave some store urls undiscovered"
    seen_url = results[0].emitted[0]["canon_url"]
    pending_url = sorted(oc.frontier)[0]
    batch = (
        new_urls
        + ["https://brand-new-host.example.org/landing"]  # host_count -> 0
        + [seen_url, pending_url, "%"]  # skipped, skipped, junk
        + [new_urls[0]]  # in-batch duplicate
    )
    n_engine = inject_seeds(
        state, spark.createDataFrame([(u,) for u in batch], "url string")
    )
    n_oracle = oc.inject(batch)
    # admitted = the new store urls + the brand-new-host url
    assert n_engine == n_oracle == len(new_urls) + 1

    manifests += run_rounds(spark, state, N_TOTAL)
    results += [oc.step(r) for r in range(N_BEFORE, N_TOTAL)]
    return state, manifests, oc, results, set(new_urls)


def test_injected_urls_scheduled(crawl):
    _, _, _, results, injected = crawl
    emitted_after = {
        e["canon_url"] for rr in results[N_BEFORE:] for e in rr.emitted
    }
    assert injected & emitted_after, "some injected urls must get scheduled"


def test_ordering_exact_after_inject(crawl):
    state, _, _, results, _ = crawl
    for r in range(N_BEFORE, N_TOTAL):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["global_rank"], row["priority"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["global_rank"], e["priority"])
            for e in results[r].emitted
        ]
        assert got == want, f"round {r}"


def test_seen_set_exact_after_inject(crawl):
    state, _, oc, _, _ = crawl
    got = {
        (row["canon_url"], row["first_round"])
        for row in state.seen_through(N_TOTAL).collect()
    }
    assert got == set(oc.seen.items())


def test_counters_exact_after_inject(crawl):
    _, manifests, _, results, _ = crawl
    for r in range(N_BEFORE, N_TOTAL):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"


def test_reinject_is_noop(crawl):
    """Everything from the original batch is now seen, pending, or junk —
    a second injection admits nothing on either side."""
    state, _, oc, _, injected = crawl
    spark = state.io.spark
    batch = sorted(injected)
    n_engine = inject_seeds(
        state, spark.createDataFrame([(u,) for u in batch], "url string")
    )
    assert n_engine == oc.inject(batch) == 0


def test_retire_then_inject_recrawls(crawl):
    """The operational re-queue: retire an emitted url, inject it, and the
    next round re-emits it on both sides."""
    from indigo_crawler_spark.operators.retire import retire_urls

    state, manifests, oc, results, _ = crawl
    spark = state.io.spark
    url = results[0].emitted[0]["canon_url"]
    urls_df = spark.createDataFrame([(url,)], "url string")
    assert retire_urls(state, urls_df) == oc.retire([url]) == 1
    assert inject_seeds(state, urls_df) == oc.inject([url]) == 1

    manifests2 = run_rounds(spark, state, N_TOTAL + 1)
    rr = oc.step(N_TOTAL)
    df = state.io.read(
        f"fetch_batches/round={N_TOTAL}", schemas.FETCH_BATCHES
    )
    got = [
        (row["canon_url"], row["global_rank"])
        for row in df.orderBy("global_rank").collect()
    ]
    want = [(e["canon_url"], e["global_rank"]) for e in rr.emitted]
    assert got == want
    assert url in {e["canon_url"] for e in rr.emitted}
    assert manifests2[-1]["counters"] == rr.counters


def test_gc_reclaims_consumed_injection(crawl):
    """injected/round=R is consumed when round R commits — GC drops the
    old side tables and protects one queued for the next round."""
    from indigo_crawler_spark.operators.retire import retire_urls
    from indigo_crawler_spark.plans.state_gc import gc_state

    state, _, oc, results, _ = crawl
    spark = state.io.spark
    # queue a fresh injection for the NEXT (uncommitted) round — retire an
    # old emission so there is something admissible to inject
    url = results[1].emitted[0]["canon_url"]
    urls_df = spark.createDataFrame([(url,)], "url string")
    retire_urls(state, urls_df)
    oc.retire([url])
    assert inject_seeds(state, urls_df) == oc.inject([url]) == 1

    # the zero-Spark status tool surfaces the queued injection
    from indigo_crawler_spark.plans.status import crawl_status

    assert crawl_status(state)["injected_pending"] == 1

    report = gc_state(state)
    consumed = [t for t in report["reclaimed"] if t.startswith("injected/")]
    assert consumed, "consumed injected side tables must be reclaimed"
    assert not any(state.io.exists(t) for t in consumed)
    # the injection queued for the next round survives GC
    assert any(
        state.io.exists(f"injected/round={r}")
        for r in range(N_TOTAL, N_TOTAL + 3)
    ), "the pending injection must be protected"


def test_inject_per_url_ranks(crawl):
    """An input carrying its own seed_rank column keeps the MIN rank per
    duplicated url, and the queued frontier rows price it into the seed
    priority formula."""
    from indigo_crawler_spark.functions.scoring import priority_expr

    state, _, _, _, _ = crawl
    spark = state.io.spark
    rows = [
        ("https://ranked-host.example.org/a", 5),
        ("https://ranked-host.example.org/a", 2),  # dup keeps rank 2
        ("https://ranked-host.example.org/b", 9),
    ]
    n = inject_seeds(
        state, spark.createDataFrame(rows, "url string, seed_rank int")
    )
    assert n == 2
    from indigo_crawler_spark.plans.round import last_complete_round

    nxt = last_complete_round(state) + 1
    got = {
        r["canon_url"]: (r["seed_rank"], r["depth"], r["priority"])
        for r in state.io.read(f"injected/round={nxt}", schemas.FRONTIER)
        .where(F.col("host") == "ranked-host.example.org")
        .collect()
    }
    # unknown host -> host_count 0 -> bit_length(1) = 1
    from indigo_crawler_spark.kernels.priority import priority_score

    assert got == {
        "https://ranked-host.example.org/a": (2, 0, priority_score(0, 2, 0)),
        "https://ranked-host.example.org/b": (9, 0, priority_score(0, 9, 0)),
    }
