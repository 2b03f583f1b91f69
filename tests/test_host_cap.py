"""Per-host lifetime emit cap (SEMANTICS.md §Host page cap): engine ≡
oracle over a multi-round crawl with a tight cap — lifetime emitted per
host never exceeds C (exactness via the headroom clip), hosts at the cap
leave permanently and their children stop entering the frontier, and the
knob is a hash extension."""

from __future__ import annotations

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


def _bootstrap(spark, tmp_path, cfg, fb):
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    return state


def test_host_cap_engine_vs_oracle(spark, tmp_path):
    n_rounds = 6
    cap = 3
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        host_page_cap=cap,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(n_rounds)

    per_host: dict[str, int] = {}
    for r in range(n_rounds):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["host"], row["rank_in_host"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["host"], e["rank_in_host"], e["global_rank"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        for _u, h, _rk, _g in got:
            per_host[h] = per_host.get(h, 0) + 1

    # the LIFETIME bound is exact: no host ever exceeds C, and the cap
    # actually bit (some host reached it and was dropped at a later gate)
    assert per_host and max(per_host.values()) <= cap
    assert any(v == cap for v in per_host.values())
    assert sum(m["counters"]["host_capped"] for m in manifests) > 0

    # the engine's committed totals equal the oracle's lifetime dict
    got_totals = {
        row["host"]: row["emitted_total"]
        for row in state.io.read(
            f"host_emitted/round={n_rounds}", schemas.HOST_EMITTED
        ).collect()
    }
    assert got_totals == oc.emitted_total == per_host

    # capped hosts admit no NEW frontier rows: every capped host's rows in
    # the final frontier were discovered no later than the round AFTER it
    # reached the cap (children of the crossing round still enter; later
    # discoveries don't — mirror of the entering-snapshot rule)
    capped_hosts = {h for h, v in per_host.items() if v == cap}
    cross_round = {}
    for h in capped_hosts:
        seen = 0
        for r in range(n_rounds):
            seen += sum(1 for e in results[r].emitted if e["host"] == h)
            if seen >= cap:
                cross_round[h] = r
                break
    frontier = state.io.read(
        f"frontier/round={n_rounds}", schemas.FRONTIER
    ).collect()
    for row in frontier:
        if row["host"] in capped_hosts:
            assert row["discovered_round"] <= cross_round[row["host"]] + 1


def test_host_cap_hash_extension():
    base = CrawlConfig()
    assert "host_page_cap" not in base._hash_dict()
    on = CrawlConfig(host_page_cap=100)
    assert on.config_hash() != base.config_hash()
    assert "host_page_cap" in on._hash_dict()
