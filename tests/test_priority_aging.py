"""Priority aging (SEMANTICS.md §Priority aging, default OFF) — deferred
frontier urls gain rank-time priority with age:

- engine ≡ oracle over a starvation-prone crawl (small budgets, small
  round cap) with the knob on: identical orderings (including the
  boosted emitted priorities), counters, seen set;
- the knob BITES: some round's schedule differs from the flag-off run;
- state stays base: the frontier table after N rounds carries exactly
  the oracle's (unboosted) priorities — deferral never compounds;
- kernel ≡ expr bit-equality on a value grid (==, not approx);
- config_hash extension behaviour.
"""

from __future__ import annotations

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.priority import aged_priority
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

N_ROUNDS = 5

BASE = dict(
    round_limit=20, num_buckets=16, bloom_bucket_capacity=64,
    default_budget=2,
)


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
        (row["canon_url"], row["global_rank"], row["priority"])
        for row in df.orderBy("global_rank").collect()
    ]


def test_aging_engine_vs_oracle_and_bites(spark, tmp_path):
    fb = fixture_bundle(**TINY)
    cfg_on = CrawlConfig(**BASE, age_weight=0.5)
    on = _boot(spark, tmp_path / "on", cfg_on, fb)
    manifests = run_rounds(spark, on, N_ROUNDS)
    oc = OracleCrawl(
        fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg_on
    )
    results = oc.run(N_ROUNDS)

    deferred = 0
    for r in range(N_ROUNDS):
        got = _rows(on, r)
        want = [
            (e["canon_url"], e["global_rank"], e["priority"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering/priority mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        deferred += manifests[r]["counters"]["budget_deferred"]
    assert deferred > 0, "fixture produced no deferrals — nothing can age"

    # state stays base: the frontier entering round N carries the oracle's
    # UNBOOSTED priorities exactly
    got_frontier = {
        row["canon_url"]: row["priority"]
        for row in on.io.read(
            f"frontier/round={N_ROUNDS}", schemas.FRONTIER
        ).collect()
    }
    want_frontier = {u: row.priority for u, row in oc.frontier.items()}
    assert got_frontier == want_frontier

    # the knob bites: the flag-off engine run schedules differently
    off = _boot(spark, tmp_path / "off", CrawlConfig(**BASE), fb)
    run_rounds(spark, off, N_ROUNDS)
    assert any(
        [u for u, _, _ in _rows(on, r)] != [u for u, _, _ in _rows(off, r)]
        for r in range(N_ROUNDS)
    ), "aging never changed a schedule — weaken budgets or raise the weight"


def test_kernel_expr_bit_equal(spark):
    import pyspark.sql.functions as F

    from indigo_crawler_spark.functions.scoring import aged_priority_expr

    vals = [
        (0.2 + 1.0 / 3.0, 0), (1.5, 2), (2.3333333333333335, 7),
        (0.1, 11), (1.0 / 7.0, 3),
    ]
    df = spark.createDataFrame(vals, "p double, d int").select(
        "p", "d",
        aged_priority_expr(F.col("p"), F.col("d"), 12, 0.37).alias("eff"),
    )
    for row in df.collect():
        assert row["eff"] == aged_priority(row["p"], row["d"], 12, 0.37)


def test_config_hash_extension():
    base = CrawlConfig()
    on = CrawlConfig(age_weight=0.125)
    assert "age_weight" not in base._hash_dict()
    assert on._hash_dict()["age_weight"] == 0.125
    assert base.config_hash() != on.config_hash()
