"""Thin-content host demotion (SEMANTICS.md §Thin-host demotion): the
whitespace-token kernel matches the Spark expression on adversarial
whitespace, engine ≡ oracle over a multi-round crawl with demotions, the
halving compounds, flag-off is inert, and the knob is a hash extension."""

from __future__ import annotations

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.tokens import whitespace_token_count_py
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


def test_ws_token_kernel_matches_spark_expr(spark):
    """The pure-Python kernel reproduces whitespace_token_count including
    the Spark-semantics corners: space-only trim, ASCII-only \\s, kept
    leading/trailing empty tokens, NBSP joining neighbors."""
    from pyspark.sql import functions as F

    from indigo_crawler_spark.functions.text_analysis import (
        whitespace_token_count,
    )

    cases = [
        "",
        "   ",
        "\n",
        "\t",
        "a",
        " a ",
        "a b",
        "a  b",
        "\ta b\t",
        "a\nb\nc",
        "line one\nline two\n",
        "a b",          # NBSP is NOT whitespace for either engine
        "mixed \t\n runs  here ",
        "\x0b\x0c",
        "word",
        "  leading and trailing  ",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string").select(
        "t", whitespace_token_count(F.col("t")).alias("n")
    )
    got = {r["t"]: r["n"] for r in df.collect()}
    for c in cases:
        assert got[c] == whitespace_token_count_py(c), repr(c)
    assert whitespace_token_count_py(None) == 0


def test_thin_hosts_engine_vs_oracle(spark, tmp_path):
    """Engine ≡ oracle with a threshold high enough that fixture hosts get
    demoted: ordering, counters (incl. thin_hosts_demoted), and the
    committed budgets chain all match; demotion visibly reduces a thin
    host's emissions in later rounds."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        thin_host_min_words=100_000,  # every fixture host is thin
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)

    demoted_any = False
    for r in range(N_ROUNDS):
        got = [
            (row["canon_url"], row["rank_in_host"], row["global_rank"])
            for row in state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
            .orderBy("global_rank")
            .collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        demoted_any = demoted_any or (
            manifests[r]["counters"]["thin_hosts_demoted"] > 0
        )
    assert demoted_any, "threshold 100k words must demote fixture hosts"

    # the committed budgets chain equals the oracle's final budget map for
    # every host the chain carries, and halving genuinely compounded
    final = {
        row["host"]: row["budget"]
        for row in state.io.read(
            f"host_budgets/round={N_ROUNDS}", schemas.HOST_BUDGETS
        ).collect()
    }
    assert final, "versioned budgets chain must exist with the gate on"
    for h, b in final.items():
        assert b == oc.budget.get(h, cfg.default_budget), h
    assert any(b == 1 for b in final.values()), (
        "5 thin rounds from default budget 8 must reach the floor of 1"
    )


def test_thin_hosts_off_is_inert(spark, tmp_path):
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, 2)
    assert not state.io.exists("host_budgets/round=1")
    assert "thin_hosts_demoted" not in manifests[0]["counters"]
    # and the knob is a hash extension: absent at default, pinned when on
    assert (
        CrawlConfig(thin_host_min_words=50).config_hash()
        != CrawlConfig().config_hash()
    )


def test_thin_and_backoff_compose(spark, tmp_path):
    """Both EP3 folds active at once (ban→backoff + thin demotion) write
    ONE composed budgets version per round and still match the oracle."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        ban_every=3,
        backoff_rounds=2,
        thin_host_min_words=100_000,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, 4)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(4)
    for r in range(4):
        got = [
            (row["canon_url"], row["global_rank"], row["status"])
            for row in state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
            .orderBy("global_rank")
            .collect()
        ]
        want = [
            (e["canon_url"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert got == want, f"round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
    # the composed chain carries BOTH effects for every host it names
    chain = {
        row["host"]: (row["budget"], row["backoff_until_round"])
        for row in state.io.read(
            "host_budgets/round=4", schemas.HOST_BUDGETS
        ).collect()
    }
    assert any(b < cfg.default_budget for b, _ in chain.values())
    for h, (b, until) in chain.items():
        assert b == oc.budget.get(h, cfg.default_budget), h
        assert until == oc.backoff.get(h, 0), h
