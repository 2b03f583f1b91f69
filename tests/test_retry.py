"""Transient-failure retry (SEMANTICS.md §Transient failures, default OFF)
— failed fetches yield no page, stay out of seen, and re-compete until
retries exhaust:

- engine ≡ oracle over a multi-round crawl with the knob on: identical
  ordering (failed rows included, status column equal), identical
  counters (fetch_failed / retry_exhausted), byte-identical texts (failed
  urls yield none);
- the retry path is REAL: at least one url is emitted in two different
  rounds (failed then retried), and at least one url exhausts;
- retries state is durable: a split run (2 rounds, then resume to 4)
  reproduces the single run bit-for-bit, through the digested +
  cross-checked retries/round=R chain;
- config_hash extension behaviour (fail_every hashed when on,
  max_retries dependent) pins resumability.
"""

from __future__ import annotations

from collections import Counter

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

# fail_every=2 on the (url, attempt) draw: roughly half of first attempts
# fail; max_retries=1 means a second failure exhausts — both the
# retry-then-succeed and the exhaust path occur with near-certainty on the
# TINY fixture's ~dozens of emitted urls
CFG = dict(
    round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
    fail_every=2, max_retries=1,
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
        (
            row["canon_url"], row["rank_in_host"], row["global_rank"],
            row["status"],
        )
        for row in df.orderBy("global_rank").collect()
    ]


def test_retry_engine_vs_oracle(spark, tmp_path):
    cfg = CrawlConfig(**CFG)
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path / "on", cfg, fb)
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)

    emitted_all = []
    failed_some, exhausted_some = 0, 0
    for r in range(N_ROUNDS):
        got = _rows(state, r)
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering/status mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        failed_some += manifests[r]["counters"]["fetch_failed"]
        exhausted_some += manifests[r]["counters"]["retry_exhausted"]
        emitted_all += got

        # byte-identical texts — failed urls yield NONE this round
        texts = {
            row["canon_url"]: row["text"]
            for row in state.io.read(
                f"fetched_text/round={r}", schemas.FETCHED_TEXT
            ).collect()
        }
        assert texts == results[r].texts, f"texts mismatch at round {r}"
        failed_urls = {u for u, _, _, s in got if s == "failed"}
        assert not (failed_urls & set(texts)), "failed url has text"

    # both retry paths actually occurred
    assert failed_some > 0, "fixture produced no transient failures"
    assert exhausted_some > 0, "fixture produced no exhausted url"
    # at least one url was emitted in MORE than one round (the retry)
    by_url = Counter(u for u, _, _, _ in emitted_all)
    retried = {u for u, n in by_url.items() if n > 1}
    assert retried, "no url was ever re-emitted"
    # a url that succeeded after failing is in seen exactly once, with the
    # SUCCESS round; the oracle seen map is the ground truth
    seen_rows = {}
    for r in range(N_ROUNDS):
        for row in state.io.read(
            f"seen/round={r}", schemas.SEEN
        ).collect():
            assert row["canon_url"] not in seen_rows, "url in seen twice"
            seen_rows[row["canon_url"]] = row["first_round"]
    assert seen_rows == oc.seen


def test_retry_split_run_bit_equal(spark, tmp_path):
    """Kill-after-round-1 resume: the retries chain re-anchors exactly —
    rounds 2..3 of a 2+2 split run equal the same rounds of one 4-round
    run, fetch batches and retries deltas alike."""
    cfg = CrawlConfig(**CFG)
    fb = fixture_bundle(**TINY)

    one = _boot(spark, tmp_path / "one", cfg, fb)
    run_rounds(spark, one, N_ROUNDS)

    two = _boot(spark, tmp_path / "two", cfg, fb)
    run_rounds(spark, two, 2)
    # fresh CrawlState over the same dir — the resume path (EP2), which
    # re-verifies the anchor round's digests INCLUDING the retries table
    two2 = CrawlState(io=TableIO(spark, str(tmp_path / "two")), cfg=cfg)
    run_rounds(spark, two2, N_ROUNDS)

    for r in range(N_ROUNDS):
        assert _rows(one, r) == _rows(two2, r), f"round {r} differs"
        a = sorted(
            (row["canon_url"], row["fails"])
            for row in one.io.read(
                f"retries/round={r}", schemas.RETRIES
            ).collect()
        ) if one.io.exists(f"retries/round={r}") else None
        b = sorted(
            (row["canon_url"], row["fails"])
            for row in two2.io.read(
                f"retries/round={r}", schemas.RETRIES
            ).collect()
        ) if two2.io.exists(f"retries/round={r}") else None
        assert a == b, f"retries delta differs at round {r}"


def test_fail_every_one_fails_every_fetch(spark, tmp_path):
    """fail_every=1 means EVERY fetch fails (draw residue 1 % fail_every
    = 0, always satisfied) — previously an unsatisfiable pmod(x,1)==1
    silent no-op. With max_retries=0 every first failure exhausts, no
    text is ever fetched, and the oracle agrees on every surface."""
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        fail_every=1, max_retries=0,
    )
    fb = fixture_bundle(**TINY)
    state = _boot(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, 2)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(2)
    emitted_total = 0
    for r in range(2):
        got = _rows(state, r)
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"], e["status"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering/status mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert all(s == "failed" for _, _, _, s in got), "non-failed fetch"
        assert manifests[r]["counters"]["fetch_failed"] == len(got)
        assert manifests[r]["counters"]["retry_exhausted"] == len(got)
        assert (
            state.io.read(f"fetched_text/round={r}", schemas.FETCHED_TEXT).count()
            == 0
        ), "a failed fetch yielded text"
        emitted_total += len(got)
    assert emitted_total > 0, "fixture emitted nothing"


def test_config_hash_extension():
    base = CrawlConfig()
    on = CrawlConfig(fail_every=2)
    on2 = CrawlConfig(fail_every=2, max_retries=5)
    assert "fail_every" not in base._hash_dict()
    assert "max_retries" not in base._hash_dict()  # dependent, master off
    assert on._hash_dict()["fail_every"] == 2
    assert on._hash_dict()["max_retries"] == 2  # hashed once master is on
    assert len({base.config_hash(), on.config_hash(), on2.config_hash()}) == 3
