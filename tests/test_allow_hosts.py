"""Host allow-list gate (SEMANTICS.md §Host allow-list, default OFF) — the
"stay on these sites" knob of a site-scoped crawl:

- kernel semantics: exact lowercase equality against the curated set (no
  suffix/contains logic, www. spelling is a DIFFERENT host), empty tuple
  allows all; kernel ≡ column-expr identity on a host battery;
- engine ≡ oracle crawl with the gate enabled: a non-allowed-host SEED
  drops at the gate (counted ``host_excluded``) and non-allowed-host
  children never enter the frontier — the trap gate's two-site shape;
  every emitted / frontier / seen host stays inside the allow set;
- flag-off inertness stated positively, config_hash extension behaviour,
  and fail-loud validation of entries that can never match a canonical
  host (scheme, slash, port, uppercase).
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.functions.traps import host_deny_expr
from indigo_crawler_spark.kernels.traps import host_allowed
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

_TS = datetime(2023, 12, 31, tzinfo=timezone.utc)

ALLOW = ("h1.example.org", "h2.example.org", "h3.example.org")

HOST_BATTERY = [
    ("h1.example.org", True),
    ("h2.example.org", True),
    ("www.h1.example.org", False),      # exact match — no suffix logic
    ("h1.example.org.evil.com", False), # equality is not contains
    ("h10.example.org", False),
    ("h3.example.org", True),
]


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_kernel_battery():
    for host, want in HOST_BATTERY:
        assert host_allowed(host, ALLOW) is want, host
    # empty tuple allows everything
    for host, _ in HOST_BATTERY:
        assert host_allowed(host, ())


def test_expr_matches_kernel_on_battery(spark):
    cfg = CrawlConfig(allow_hosts=ALLOW)
    df = spark.createDataFrame(
        [(h,) for h, _ in HOST_BATTERY], "host string"
    ).select("host", (~host_deny_expr(F.col("host"), cfg)).alias("ok"))
    got = {row["host"]: row["ok"] for row in df.collect()}
    for host, want in HOST_BATTERY:
        assert got[host] == host_allowed(host, ALLOW), host
    # empty default folds to lit(False) (nothing denied)
    off = CrawlConfig()
    df2 = spark.createDataFrame([(h,) for h, _ in HOST_BATTERY], "host string")
    assert df2.where(host_deny_expr(F.col("host"), off)).count() == 0


# ---------------------------------------------------------------------------
# engine vs oracle with the gate enabled
# ---------------------------------------------------------------------------
# a hub on an allowed host whose children include one allowed-host page and
# one non-allowed-host page (the discovery-site drop)
ALLOW_HUB = (
    b"<html><body><p>hub words</p>"
    b'<a href="https://h2.example.org/allowed/child">in</a>'
    b'<a href="https://offsite.example.net/lure/1">out</a>'
    b"</body></html>"
)
LEAF = b"<html><body><p>leaf words</p></body></html>"

N_ROUNDS = 3


def _allow_bundle():
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page("https://h1.example.org/allow-hub", ALLOW_HUB),
        page("https://h2.example.org/allowed/child", LEAF),
        # a store page FOR the off-site child exists — exclusion must come
        # from the gate/discovery, not from store absence
        page("https://offsite.example.net/lure/1", LEAF),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": "https://h1.example.org/allow-hub", "seed_rank": next_rank},
    ]
    return {**fb, "pages": pages, "seeds": seeds}


def _run_both(spark, tmp_path, cfg, fb):
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    return state, manifests, oc, oc.run(N_ROUNDS)


def test_allow_hosts_engine_vs_oracle(spark, tmp_path):
    fb = _allow_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        allow_hosts=ALLOW,
    )
    state, manifests, oc, results = _run_both(spark, tmp_path / "on", cfg, fb)
    emitted = []
    for r in range(N_ROUNDS):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["rank_in_host"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        emitted += [u for u, _, _ in got]

    # TINY seeds at least one host outside ALLOW (h8) — dropped at the
    # round-0 gate and counted (the exact figure is pinned by the
    # counters-equality assertions above; robots precedence means a seed
    # denied by robots counts there instead)
    assert manifests[0]["counters"]["host_excluded"] >= 1
    # the hub and its allowed child were crawled; the off-site lure never
    assert "https://h1.example.org/allow-hub" in emitted
    assert "https://h2.example.org/allowed/child" in emitted
    assert "https://offsite.example.net/lure/1" not in emitted
    # every emitted / seen / frontier host is inside the allow set
    assert all(_host_of(u) in ALLOW for u in emitted)
    assert all(_host_of(u) in ALLOW for u in oc.seen)
    for r in range(1, N_ROUNDS + 1):
        fr = state.io.read(f"frontier/round={r}", schemas.FRONTIER)
        bad = [
            row["canon_url"]
            for row in fr.collect()
            if row["host"] not in ALLOW
        ]
        assert bad == [], f"non-allowed hosts in frontier/round={r}"


def test_flag_off_crawls_them(spark, tmp_path):
    """Inertness, stated positively: with the default empty tuple the same
    bundle schedules the off-site lure like any other url, the counter key
    is absent from every manifest, and engine still matches oracle."""
    fb = _allow_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, oc, results = _run_both(spark, tmp_path / "off", cfg, fb)
    emitted = []
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "host_excluded" not in manifests[r]["counters"]
        emitted += [
            row["canon_url"]
            for row in state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            ).collect()
        ]
    assert "https://offsite.example.net/lure/1" in emitted


def test_config_hash_extension():
    """Default-empty is hash-absent (pre-flag state dirs keep resuming);
    a non-empty allow list changes the hash like every semantic knob, and
    different lists hash differently."""
    base = CrawlConfig()
    on = CrawlConfig(allow_hosts=("a.org",))
    on2 = CrawlConfig(allow_hosts=("a.org", "b.org"))
    assert "allow_hosts" not in base._hash_dict()
    assert on._hash_dict()["allow_hosts"] == ("a.org",)
    assert len({base.config_hash(), on.config_hash(), on2.config_hash()}) == 3


def test_unmatchable_entries_fail_loud():
    """Entries that can never equal a canonical host are config BUGS, not
    no-ops: the canonical host is lowercase with no scheme/path/port."""
    for bad in ("Example.org", "https://a.com", "a.com/path", "a.com:8080", "", "a b.com"):
        with pytest.raises(ValueError, match="never match"):
            CrawlConfig(allow_hosts=(bad,))
    assert CrawlConfig(allow_hosts=("example.org",)).allow_hosts


def test_cli_normalizes_and_refuses():
    """--allow-host 'H1.Example.ORG' normalizes to lowercase; URL-shaped
    entries are refused at argparse (exit 2, no traceback)."""
    import jobs.run_rounds as cli

    class _AP:
        def error(self, msg):
            raise SystemExit(2)

    assert cli._norm_hosts(_AP(), ["H1.Example.ORG", " h2.example.org ", ""]) == (
        "h1.example.org", "h2.example.org",
    )
    with pytest.raises(SystemExit):
        cli._norm_hosts(_AP(), ["https://a.com"])
