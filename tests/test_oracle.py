"""T0/T1 — oracle simulator invariants on the tiny fixture (no Spark)."""

from __future__ import annotations

from collections import Counter

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.robots import robots_allowed
from oracle.simulator import OracleCrawl


def make(cfg=None):
    fb = fixture_bundle(**TINY)
    return fb, OracleCrawl(
        fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"],
        cfg or CrawlConfig(round_limit=50),
    )


def test_politeness_budget_respected():
    fb, oc = make()
    budgets = {b["host"]: b["budget"] for b in fb["host_budgets"]}
    for rr in oc.run(5):
        per_host = Counter(e["host"] for e in rr.emitted)
        for host, n in per_host.items():
            assert n <= budgets.get(host, oc.cfg.default_budget)


def test_ordering_is_total_and_by_priority():
    _, oc = make()
    for rr in oc.run(4):
        keys = [(-e["priority"], e["canon_url"]) for e in rr.emitted]
        assert keys == sorted(keys)
        ranks = [e["global_rank"] for e in rr.emitted]
        assert ranks == list(range(1, len(ranks) + 1))
        for e in rr.emitted:
            assert e["batch_id"] == (e["global_rank"] - 1) // oc.cfg.batch_size


def test_no_refetch_and_seen_grows():
    _, oc = make()
    results = oc.run(6)
    urls = [e["canon_url"] for rr in results for e in rr.emitted]
    assert len(urls) == len(set(urls))  # never emitted twice
    assert set(urls) == set(oc.seen)


def test_robots_never_emitted():
    fb, oc = make()
    robots = {r["host"]: r["robots_txt"] for r in fb["robots"]}
    for rr in oc.run(5):
        for e in rr.emitted:
            assert robots_allowed(e["canon_url"], robots.get(e["host"]))


def test_global_cap():
    fb = fixture_bundle(**TINY)
    oc = OracleCrawl(
        fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"],
        CrawlConfig(round_limit=5),
    )
    for rr in oc.run(4):
        assert len(rr.emitted) <= 5


def test_deterministic_across_runs():
    _, oc1 = make()
    _, oc2 = make()
    r1, r2 = oc1.run(4), oc2.run(4)
    assert oc1.ordering(r1) == oc2.ordering(r2)
    assert [rr.counters for rr in r1] == [rr.counters for rr in r2]
    for a, b in zip(r1, r2):
        assert a.texts == b.texts


def test_max_depth_respected():
    fb = fixture_bundle(**TINY)
    oc = OracleCrawl(
        fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"],
        CrawlConfig(round_limit=50, max_depth=1),
    )
    oc.run(6)
    # depth >1 never entered the frontier
    assert all(row.depth <= 1 for row in oc.frontier.values())
