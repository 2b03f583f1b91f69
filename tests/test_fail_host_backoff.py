"""Dead-host failure backoff (SEMANTICS.md §Transient failures ¶7,
default OFF) — a host whose failed-fetch count in a round reaches
``fail_host_threshold`` backs off like a banned host:

- engine ≡ oracle over a multi-round crawl with the knob on: identical
  ordering/statuses, identical counters (incl. ``failhost_backoff`` and
  the ``backoff_skipped`` rows the pause later produces), identical
  budgets table after N rounds;
- the backoff actually BITES: at least one host triggers, and at least
  one frontier row is deferred at the gate in a later round because of it
  (no bans configured, so every skip is failure-driven);
- threshold-off (0) with the same fail_every is identical to a plain
  retry run — the fold is never added;
- config_hash: dependent extension (inert while fail_every = 0; hashed
  once the master is on).
"""

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

N_ROUNDS = 4

# fail_every=2 fails ~half of attempts; threshold=2 triggers on any host
# with ≥2 failures in one round — with TINY's per-host budgets that
# happens with near-certainty by round 1. backoff_rounds=1 keeps the
# pause short enough that a paused host re-enters inside the run.
CFG = dict(
    round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
    fail_every=2, max_retries=3, fail_host_threshold=2, backoff_rounds=1,
)


def _boot(spark, tmp_path, cfg, fb):
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


def _rows(state, r):
    df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
    return [
        (row["canon_url"], row["global_rank"], row["status"])
        for row in df.orderBy("global_rank").collect()
    ]


def test_failhost_engine_vs_oracle(spark, tmp_path):
    cfg = CrawlConfig(**CFG)
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path / "on", cfg, fb)
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)

    triggered, skipped = 0, 0
    for r in range(N_ROUNDS):
        got = _rows(state, r)
        want = [
            (e["canon_url"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering/status mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        triggered += manifests[r]["counters"]["failhost_backoff"]
        skipped += manifests[r]["counters"]["backoff_skipped"]

    # the loop is REAL on this fixture: hosts trigger, and (no bans
    # configured) every later backoff_skipped row is failure-driven
    assert triggered > 0, "no host ever hit the failure threshold"
    assert skipped > 0, "failure backoff never gated a frontier row"

    # budgets table after N rounds matches the oracle fold exactly
    df = state.io.read(
        f"host_budgets/round={N_ROUNDS}", schemas.HOST_BUDGETS
    )
    got_b = {
        (row["host"], row["budget"], row["backoff_until_round"])
        for row in df.collect()
    }
    hosts = set(oc.budget) | set(oc.backoff)
    want_b = {
        (h, oc.budget.get(h, cfg.default_budget), oc.backoff.get(h, 0))
        for h in hosts
    }
    assert got_b == want_b


def test_threshold_off_identical_to_plain_retry(spark, tmp_path):
    """fail_host_threshold=0 with the same fail_every produces the exact
    run a pre-knob engine produced: same orderings, same counters (no
    failhost_backoff key), no budgets writes beyond bootstrap."""
    base = {**CFG, "fail_host_threshold": 0, "max_retries": 1}
    cfg = CrawlConfig(**base)
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path / "off", cfg, fb)
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)
    for r in range(N_ROUNDS):
        assert _rows(state, r) == [
            (e["canon_url"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert manifests[r]["counters"] == results[r].counters
        assert "failhost_backoff" not in manifests[r]["counters"]
        assert manifests[r]["counters"]["backoff_skipped"] == 0
        # no budgets fold wrote: only the bootstrap-static table exists
        assert not state.io.exists(f"host_budgets/round={r + 1}")


def test_config_hash_dependent():
    base = CrawlConfig()
    plain = CrawlConfig(fail_every=2)
    thresh = CrawlConfig(fail_every=2, fail_host_threshold=2)
    # dependent: absent while the master is off, even at non-default
    assert "fail_host_threshold" not in base._hash_dict()
    assert (
        "fail_host_threshold"
        not in CrawlConfig(fail_host_threshold=5)._hash_dict()
    )
    # hashed (at any value) once the master is on
    assert plain._hash_dict()["fail_host_threshold"] == 0
    assert thresh._hash_dict()["fail_host_threshold"] == 2
    assert len(
        {base.config_hash(), plain.config_hash(), thresh.config_hash()}
    ) == 3
