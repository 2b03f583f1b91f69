"""Extension gates (SEMANTICS.md §Traps / §Politeness additions):

- trap-URL detection: kernel ≡ column-expr identity on a URL battery, and
  a full engine-vs-oracle crawl with the gate enabled (frontier drop at the
  gate + discovery-side drop, counters equal);
- robots Crawl-delay → per-round budget cap (engine ≡ oracle);
- registered-domain shared budget (engine ≡ oracle, domain_deferred);
- config_hash extension-field scheme: default-valued extensions hash
  exactly like a config that predates them; enabling one changes the hash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.functions.traps import trap_expr
from indigo_crawler_spark.kernels.robots import crawl_delay
from indigo_crawler_spark.kernels.traps import (
    is_trap_url,
    max_segment_repeat,
    path_segments,
    url_path,
)
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

URL_BATTERY = [
    "https://h1.example.org/",
    "https://h1.example.org/a",
    "https://h1.example.org/a/b/c",
    "https://h1.example.org/a/a/a/a",
    "https://h1.example.org/a/b/a/b/a",
    "https://h1.example.org/p/1?q=/x/y/z/w/v",  # query must not count as path
    "https://h1.example.org/cal/2024/01/02/03/04",
    "https://h1.example.org/x" + "/x" * 30,
    "https://h1.example.org/" + "s" * 300,
    "https://h1.example.org/%7Euser/a//b/",  # empty segments don't count
    "http://h2.example.org:8080/a/b",
    "https://h1.example.org/über/über",  # unicode length = chars
]


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_kernel_paths_and_repeats():
    assert url_path("https://h/a/b?q=/x/y") == "/a/b"
    assert url_path("https://h") == ""
    assert path_segments("https://h/a//b/") == ["a", "b"]
    assert max_segment_repeat("https://h/a/b/a/a") == 3
    assert max_segment_repeat("https://h/") == 0
    # each limit independently, 0 = off
    assert not is_trap_url("https://h/a/b/c")
    assert is_trap_url("https://h/a/b/c", max_depth=2)
    assert not is_trap_url("https://h/a/b/c", max_depth=3)
    assert is_trap_url("https://h/a/a/b", max_repeat=1)
    assert not is_trap_url("https://h/a/a/b", max_repeat=2)
    assert is_trap_url("https://h/abc", max_url_len=12)
    assert not is_trap_url("https://h/abc", max_url_len=13)


@pytest.mark.parametrize(
    "cfg",
    [
        CrawlConfig(trap_max_depth=3),
        CrawlConfig(trap_max_repeat=2),
        CrawlConfig(trap_max_url_len=40),
        CrawlConfig(trap_max_depth=4, trap_max_repeat=3, trap_max_url_len=60),
        CrawlConfig(),  # all off → never a trap
    ],
)
def test_expr_matches_kernel_on_battery(spark, cfg):
    df = spark.createDataFrame([(u,) for u in URL_BATTERY], ["canon_url"])
    got = {
        r["canon_url"]: r["t"]
        for r in df.withColumn("t", trap_expr(F.col("canon_url"), cfg)).collect()
    }
    for u in URL_BATTERY:
        want = is_trap_url(
            u, cfg.trap_max_depth, cfg.trap_max_repeat, cfg.trap_max_url_len
        )
        assert got[u] == want, f"expr/kernel disagree on {u!r}"


# ---------------------------------------------------------------------------
# engine vs oracle with the extension gates enabled
# ---------------------------------------------------------------------------
TRAP_HTML = (
    b"<html><body>"
    b'<a href="https://h1.example.org/loop/loop/loop/x">t</a>'
    b'<a href="https://h1.example.org/a/b/c/d/e/f/g">deep</a>'
    b'<a href="https://h2.example.org/ok/fine">ok</a>'
    b"<p>body words here</p></body></html>"
)


def _run_both(spark, tmp_path, cfg, fb, n_rounds=3):
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    return state, manifests, oc, oc.run(n_rounds)


def _assert_equal_crawl(state, manifests, oracle_results, n_rounds):
    for r in range(n_rounds):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["rank_in_host"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"])
            for e in oracle_results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == oracle_results[r].counters, f"round {r}"


def test_trap_gate_engine_vs_oracle(spark, tmp_path):
    """TINY fixture with a URL-length limit that splits the corpus, plus a
    hand-built trap page exercising the discovery-side drop (deep + repeated
    path children must never enter the frontier)."""
    fb = fixture_bundle(**TINY)
    from datetime import datetime, timezone

    trap_page = {
        "url": "https://h1.example.org/trapdoor",
        "warc_ts": datetime(2023, 12, 31, tzinfo=timezone.utc),
        "html": TRAP_HTML,
        "text": None,
        "lang": "en",
    }
    fb = {**fb, "pages": fb["pages"] + [trap_page]}
    fb["seeds"] = fb["seeds"] + [
        {"url": "https://h1.example.org/trapdoor", "seed_rank": 0},
        # a trap SEED: canonicalizes fine, enters the round-0 frontier, and
        # must be dropped AT THE GATE (counted in trap_dropped)
        {"url": "https://h1.example.org/s/s/s/x", "seed_rank": 1},
    ]
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        trap_max_depth=4,
        trap_max_repeat=2,
        trap_max_url_len=44,
    )
    state, manifests, oc, results = _run_both(spark, tmp_path, cfg, fb)
    _assert_equal_crawl(state, manifests, results, 3)
    # the gate actually fired somewhere
    assert sum(m["counters"]["trap_dropped"] for m in manifests) > 0
    # trap children never entered the frontier: seen ∪ frontier hold none
    bad = [u for u in oc.seen if is_trap_url(u, 4, 2, 44)]
    assert bad == []
    for r in range(1, 4):
        fr = state.io.read(f"frontier/round={r}", schemas.FRONTIER)
        got = [
            row["canon_url"]
            for row in fr.collect()
            if is_trap_url(row["canon_url"], 4, 2, 44)
        ]
        assert got == [], f"trap urls in frontier/round={r}"


def test_crawl_delay_budget_cap_engine_vs_oracle(spark, tmp_path):
    """Hosts whose robots.txt declares Crawl-delay get their per-round
    budget capped at max(1, floor(round_seconds / delay)); others keep
    theirs. Engine ≡ oracle on ordering and counters."""
    fb = fixture_bundle(**TINY)
    robots = []
    for i, row in enumerate(fb["robots"]):
        txt = row["robots_txt"]
        if i % 3 == 0:
            txt = "User-agent: *\nCrawl-delay: 7\nDisallow:"
        elif i % 3 == 1:
            txt = "User-agent: indigo-spark\nCrawl-delay: 2.5\nDisallow:"
        robots.append({**row, "robots_txt": txt})
    fb = {**fb, "robots": robots}
    cfg = CrawlConfig(round_limit=50, num_buckets=16, round_seconds=15)
    # sanity on the kernel itself
    assert crawl_delay("User-agent: *\nCrawl-delay: 7\nDisallow:") == 7.0
    assert crawl_delay("User-agent: *\nDisallow:") is None
    state, manifests, oc, results = _run_both(spark, tmp_path, cfg, fb)
    _assert_equal_crawl(state, manifests, results, 3)
    # the cap actually bit: capped hosts emit ≤ floor(15/7)=2 per round
    for r in range(3):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        per_host = {
            row["host"]: row["n"]
            for row in df.groupBy("host").agg(F.count("*").alias("n")).collect()
        }
        for i, row in enumerate(robots):
            if i % 3 == 0 and row["host"] in per_host:
                assert per_host[row["host"]] <= 2


def test_domain_budget_engine_vs_oracle(spark, tmp_path):
    """All TINY hosts share the registered domain example.org, so a domain
    budget of 12 caps every round at 12 emitted rows — engine ≡ oracle and
    domain_deferred accounts for the rest."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(round_limit=50, num_buckets=16, domain_budget=12)
    state, manifests, oc, results = _run_both(spark, tmp_path, cfg, fb)
    _assert_equal_crawl(state, manifests, results, 3)
    assert all(m["counters"]["emitted"] <= 12 for m in manifests)
    assert sum(m["counters"]["domain_deferred"] for m in manifests) > 0


# ---------------------------------------------------------------------------
# config_hash extension scheme
# ---------------------------------------------------------------------------
def test_config_hash_extension_fields():
    base = CrawlConfig()
    # default-valued extensions are ABSENT from the hash dict (a config that
    # predates the fields hashes identically)
    d = base._hash_dict()
    for k in CrawlConfig._HASH_EXTENSION_DEFAULTS:
        assert k not in d
    # enabling any extension changes the hash (it changes results)
    assert CrawlConfig(trap_max_depth=8).config_hash() != base.config_hash()
    assert CrawlConfig(round_seconds=30).config_hash() != base.config_hash()
    assert CrawlConfig(domain_budget=4).config_hash() != base.config_hash()
    # and enters the legacy-scheme hash too, so a non-default extension can
    # never match a manifest committed before the field existed
    assert (
        CrawlConfig(domain_budget=4).config_hash_legacy(1024)
        != base.config_hash_legacy(1024)
    )
