"""Exclude-pattern gate (SEMANTICS.md §Exclude patterns, default OFF) —
the operator deny-list regexes the structural trap limits can't express:

- kernel semantics: unanchored contains-match, any-of fold, empty tuple
  never matches, compiled-pattern cache;
- kernel ≡ column-expr identity on a URL battery covering the pinned
  common regex dialect (literals, char classes, anchors, alternation,
  escapes, counted repeats);
- engine ≡ oracle crawl with patterns enabled: the gate site drops a
  matching SEED from the round-0 frontier (counted ``pattern_excluded``)
  and the discovery site keeps matching children out of the frontier
  entirely (not counted — mirroring the trap gate's two-site shape);
- flag-off inertness: empty-tuple crawls keep counters/manifests free of
  the key, and the config_hash extension behaviour pins resumability.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.functions.traps import exclude_expr
from indigo_crawler_spark.kernels.traps import matches_exclude
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

_TS = datetime(2023, 12, 31, tzinfo=timezone.utc)

URL_BATTERY = [
    "https://h1.example.org/",
    "https://h1.example.org/account/logout",
    "https://h1.example.org/logout",          # pattern at path end
    "https://h1.example.org/blogout",         # '/logout' needs the '/': no match
    "https://h1.example.org/cart/item7",
    "https://h1.example.org/cartoons/x",      # '/cart/' must NOT match '/cartoons/'
    "https://h1.example.org/list?page=2&sort=price",
    "https://h1.example.org/list?sort=price",
    "https://h1.example.org/sort/guide",      # 'sort' as a path segment
    "https://h1.example.org/dl/setup5.exe",
    "https://h1.example.org/dl/setup5.exe.txt",  # \.exe$ anchored: no match
    "https://h2.example.org:8080/session/abc123def",
    "https://h1.example.org/p/2024/01/02",
    "https://h1.example.org/über/exit",       # unicode path, no match
]

PATTERNS = ("/logout", "/cart/", r"[?&]sort=", r"\.exe$", r"/session/\w{6,}")


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_kernel_battery():
    assert matches_exclude("https://h/account/logout", PATTERNS)
    assert matches_exclude("https://h/x?a=1&sort=asc", PATTERNS)
    assert matches_exclude("https://h/f.exe", PATTERNS)
    assert not matches_exclude("https://h/f.exe.txt", PATTERNS)
    assert not matches_exclude("https://h/cartoons/x", PATTERNS)
    assert matches_exclude("https://h/session/abcdef1", PATTERNS)
    assert not matches_exclude("https://h/session/abc", PATTERNS)
    # empty tuple (the default) never matches
    assert not matches_exclude("https://h/account/logout", ())
    # any-of fold: a url matching only the LAST pattern is still excluded
    assert matches_exclude("https://h/session/zzzzzzz", PATTERNS)


@pytest.mark.parametrize(
    "cfg",
    [
        CrawlConfig(exclude_patterns=PATTERNS),
        CrawlConfig(exclude_patterns=("/logout",)),
        CrawlConfig(exclude_patterns=(r"\.exe$", r"^https://h2\.",)),
        CrawlConfig(),  # empty → never excluded
    ],
)
def test_expr_matches_kernel_on_battery(spark, cfg):
    df = spark.createDataFrame([(u,) for u in URL_BATTERY], ["canon_url"])
    got = {
        r["canon_url"]: r["x"]
        for r in df.withColumn("x", exclude_expr(F.col("canon_url"), cfg)).collect()
    }
    for u in URL_BATTERY:
        want = matches_exclude(u, cfg.exclude_patterns)
        assert got[u] == want, f"expr/kernel disagree on {u!r}"


# ---------------------------------------------------------------------------
# engine vs oracle with the gate enabled
# ---------------------------------------------------------------------------
# a hub whose children include one clean page and two pattern-matching urls
# (the discovery-site drop: neither may ever enter the frontier)
EXC_HUB = (
    b"<html><body><p>hub words</p>"
    b'<a href="https://exc.example.org/article/1">ok</a>'
    b'<a href="https://exc.example.org/account/logout">bye</a>'
    b'<a href="https://exc.example.org/cart/item3">buy</a>'
    b"</body></html>"
)
LEAF = b"<html><body><p>leaf words</p></body></html>"

N_ROUNDS = 3


def _exc_bundle():
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page("https://h1.example.org/exc-hub", EXC_HUB),
        page("https://exc.example.org/article/1", LEAF),
        # store pages FOR the excluded urls exist — exclusion must come from
        # the gate/discovery, not from store absence
        page("https://exc.example.org/account/logout", LEAF),
        page("https://exc.example.org/cart/item3", LEAF),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": "https://h1.example.org/exc-hub", "seed_rank": next_rank},
        # a matching SEED: canonicalizes fine, enters the round-0 frontier,
        # and must be dropped AT THE GATE (counted pattern_excluded)
        {"url": "https://h1.example.org/cart/seeded", "seed_rank": next_rank + 1},
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


def test_exclude_gate_engine_vs_oracle(spark, tmp_path):
    fb = _exc_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        exclude_patterns=("/logout", "/cart/"),
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

    # the matching seed was dropped at the gate and counted exactly once
    assert sum(m["counters"]["pattern_excluded"] for m in manifests) == 1
    assert "https://h1.example.org/cart/seeded" not in emitted
    # the clean hub + its clean child were crawled
    assert "https://h1.example.org/exc-hub" in emitted
    assert "https://exc.example.org/article/1" in emitted
    # no excluded url was ever scheduled, despite store pages existing
    assert not any(matches_exclude(u, cfg.exclude_patterns) for u in emitted)
    # discovery-site drop: excluded children never entered seen or any
    # frontier version (the trap gate's invariant, same shape)
    assert not any(matches_exclude(u, cfg.exclude_patterns) for u in oc.seen)
    for r in range(1, N_ROUNDS + 1):
        fr = state.io.read(f"frontier/round={r}", schemas.FRONTIER)
        bad = [
            row["canon_url"]
            for row in fr.collect()
            if matches_exclude(row["canon_url"], cfg.exclude_patterns)
        ]
        assert bad == [], f"excluded urls in frontier/round={r}"


def test_flag_off_crawls_them(spark, tmp_path):
    """Inertness, stated positively: with the default empty tuple the same
    bundle schedules the logout/cart urls like any others, the counter key
    is absent from every manifest, and engine still matches oracle."""
    fb = _exc_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, oc, results = _run_both(spark, tmp_path / "off", cfg, fb)
    emitted = []
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "pattern_excluded" not in manifests[r]["counters"]
        emitted += [
            row["canon_url"]
            for row in state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            ).collect()
        ]
    assert "https://h1.example.org/cart/seeded" in emitted
    assert "https://exc.example.org/account/logout" in emitted


def test_config_hash_extension():
    """Default-empty is hash-absent (pre-flag state dirs keep resuming);
    a non-empty pattern list changes the hash like every semantic knob,
    and different lists hash differently."""
    base = CrawlConfig()
    on = CrawlConfig(exclude_patterns=("/logout",))
    on2 = CrawlConfig(exclude_patterns=("/logout", "/cart/"))
    assert "exclude_patterns" not in base._hash_dict()
    assert on._hash_dict()["exclude_patterns"] == ("/logout",)
    assert len({base.config_hash(), on.config_hash(), on2.config_hash()}) == 3
