"""Mid-crawl robots updates (SEMANTICS.md §Robots updates) — per-host
robots.txt replacements queued between rounds gate from the next round on:

- engine (``robots_delta/round=R`` side table, max-upd_round-per-host fold)
  ≡ oracle (dict replace) through a TIGHTEN (busiest frontier host goes
  deny-all — its pending urls drop at the gate, robots_denied matches, no
  emissions from it afterwards) and a later LOOSEN back to allow-all:
  identical orderings, counters, seen set;
- split-run resume bit-equality: a crawl interrupted after the tighten
  resumes through the delta chain to the same rounds bit-for-bit;
- replace-pending semantics: a second update for the same host before the
  round runs wins; duplicate hosts within one call keep the lexically-max
  text (both mirrored by the oracle);
- no-delta identity: robots_through of an update-free crawl returns
  exactly the static table.
"""

from __future__ import annotations

from collections import Counter

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.operators.inject import update_robots
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from oracle.simulator import OracleCrawl, _host_of

N_BEFORE = 2
N_LOOSEN = 4
N_TOTAL = 6

DENY_ALL = "User-agent: *\nDisallow: /"
ALLOW_ALL = "User-agent: *\nDisallow:"


def _boot(spark, path, cfg, fb):
    state = CrawlState(io=TableIO(spark, str(path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    return state


def _rows(state, r):
    df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
    return [
        (row["canon_url"], row["global_rank"], row["status"])
        for row in df.orderBy("global_rank").collect()
    ]


def _update(state, spark, pairs):
    return update_robots(
        state,
        spark.createDataFrame(list(pairs), "host string, robots_txt string"),
    )


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path_factory.mktemp("rupd"), cfg, fb)
    manifests = run_rounds(spark, state, N_BEFORE)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_BEFORE)

    # tighten the busiest pending host — its urls must stop at round 2's gate
    target = Counter(_host_of(u) for u in oc.frontier).most_common(1)[0][0]
    n_e = _update(state, spark, [(target, DENY_ALL)])
    n_o = oc.inject_robots([(target, DENY_ALL)])
    assert n_e == n_o == 1

    manifests += run_rounds(spark, state, N_LOOSEN)
    results += [oc.step(r) for r in range(N_BEFORE, N_LOOSEN)]

    # loosen it back — later-generation delta must win the fold
    _update(state, spark, [(target, ALLOW_ALL)])
    oc.inject_robots([(target, ALLOW_ALL)])
    manifests += run_rounds(spark, state, N_TOTAL)
    results += [oc.step(r) for r in range(N_LOOSEN, N_TOTAL)]
    return state, manifests, oc, results, target


def test_engine_vs_oracle_through_updates(crawl):
    state, manifests, _, results, _ = crawl
    for r in range(N_TOTAL):
        got = _rows(state, r)
        want = [
            (e["canon_url"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"


def test_tighten_actually_gates(crawl):
    state, manifests, _, _, target = crawl
    # the target host fetched before the update...
    before = {u for r in range(N_BEFORE) for u, _, _ in _rows(state, r)}
    assert any(_host_of(u) == target for u in before), (
        "fixture target host never emitted pre-update — pick a busier host"
    )
    # ...and never again between tighten and loosen
    between = {
        u for r in range(N_BEFORE, N_LOOSEN) for u, _, _ in _rows(state, r)
    }
    assert not any(_host_of(u) == target for u in between)
    # the drops are visible as robots_denied work in the tightened rounds
    assert any(
        manifests[r]["counters"]["robots_denied"] > 0
        for r in range(N_BEFORE, N_LOOSEN)
    )


def test_seen_set_exact(crawl):
    state, _, oc, _, _ = crawl
    got = {
        (row["canon_url"], row["first_round"])
        for row in state.seen_through(N_TOTAL).collect()
    }
    assert got == set(oc.seen.items())


def test_split_run_resume_bit_equal(spark, tmp_path):
    """The delta chain re-anchors on resume: interrupting after the
    tightened round and resuming with a fresh CrawlState reproduces the
    continuous run bit-for-bit."""
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    oc.run(N_BEFORE)
    target = Counter(_host_of(u) for u in oc.frontier).most_common(1)[0][0]

    one = _boot(spark, tmp_path / "one", cfg, fb)
    run_rounds(spark, one, N_BEFORE)
    _update(one, spark, [(target, DENY_ALL)])
    run_rounds(spark, one, N_LOOSEN)

    two = _boot(spark, tmp_path / "two", cfg, fb)
    run_rounds(spark, two, N_BEFORE)
    _update(two, spark, [(target, DENY_ALL)])
    run_rounds(spark, two, N_BEFORE + 1)
    # fresh state over the same dir — the resume path re-anchors, then the
    # remaining rounds re-read the committed robots_delta chain
    two2 = CrawlState(io=TableIO(spark, str(tmp_path / "two")), cfg=cfg)
    run_rounds(spark, two2, N_LOOSEN)

    for r in range(N_LOOSEN):
        assert _rows(one, r) == _rows(two2, r), f"round {r} differs"


def test_replace_pending_and_lexical_max(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path, cfg, fb)
    run_rounds(spark, state, 1)
    host = sorted({_host_of(s["url"]) for s in fb["seeds"]})[0]

    # duplicate host in ONE call: lexically-max text wins (engine + oracle)
    _update(state, spark, [(host, "a-text"), (host, "b-text")])
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    oc.run(1)
    oc.inject_robots([(host, "a-text"), (host, "b-text")])
    fold = {
        r["host"]: r["robots_txt"]
        for r in state.robots_through(1).collect()
    }
    assert fold[host] == "b-text" == oc.robots[host]

    # a second CALL before the round runs replaces the pending row
    _update(state, spark, [(host, "a-text")])
    oc.inject_robots([(host, "a-text")])
    fold = {
        r["host"]: r["robots_txt"]
        for r in state.robots_through(1).collect()
    }
    assert fold[host] == "a-text" == oc.robots[host]


def test_no_delta_identity(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path, cfg, fb)
    static = sorted(
        (r["host"], r["robots_txt"])
        for r in state.io.read("robots", schemas.ROBOTS).collect()
    )
    folded = sorted(
        (r["host"], r["robots_txt"])
        for r in state.robots_through(3).collect()
    )
    assert static == folded
