"""RFC 9309 robots wildcards (SEMANTICS.md §Robots wildcards, default OFF)
— `*` / trailing-`$` matching in Allow/Disallow with longest-pattern
precedence:

- kernel battery over the pinned grammar: wildcard spans, end anchor,
  longest-match precedence, Allow-wins-ties, group selection (specific
  agent beats `*`, star group NOT merged in), pre-group rules ignored,
  query included in the match target, unparseable → allow;
- divergence from the stdlib matcher is REAL (the rules the knob exists
  for change outcomes) and flag-off preserves stdlib byte-behavior;
- engine ≡ oracle crawl with the knob on: wildcard-denied seeds drop at
  the gate (counted robots_denied) and are never scheduled; the same
  bundle with the knob off schedules them (stdlib prefix semantics);
- config_hash extension behaviour pins resumability.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.robots import (
    robots_allowed,
    robots_allowed_rfc,
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

_TS = datetime(2023, 12, 31, tzinfo=timezone.utc)


# ---------------------------------------------------------------------------
# kernel battery
# ---------------------------------------------------------------------------
def test_wildcard_and_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\nAllow: /public/*.pdf$\n"
    assert not robots_allowed_rfc("https://h/a/x.pdf", txt)
    # trailing-$ anchor: a query tail breaks the end match
    assert robots_allowed_rfc("https://h/a/x.pdf?x=1", txt)
    # longer Allow pattern beats the shorter Disallow
    assert robots_allowed_rfc("https://h/public/x.pdf", txt)
    # star spans empty
    assert not robots_allowed_rfc("https://h/.pdf", txt)
    txt2 = "User-agent: *\nDisallow: /*?sessionid=\n"
    # query is part of the match target
    assert not robots_allowed_rfc("https://h/p?sessionid=abc", txt2)
    assert robots_allowed_rfc("https://h/p?session=abc", txt2)
    # $ not at the end is literal
    txt3 = "User-agent: *\nDisallow: /a$b\n"
    assert not robots_allowed_rfc("https://h/a$b/c", txt3)
    assert robots_allowed_rfc("https://h/ab/c", txt3)


def test_precedence_and_groups():
    # equal length: Allow wins
    assert robots_allowed_rfc("https://h/x", "User-agent: *\nAllow: /x\nDisallow: /x\n")
    # most specific agent group wins; the * group is NOT merged in
    txt = "User-agent: indigo\nDisallow: /a\nUser-agent: *\nDisallow: /\n"
    assert not robots_allowed_rfc("https://h/a/b", txt, "indigo-spark")
    assert robots_allowed_rfc("https://h/z", txt, "indigo-spark")
    # multi-agent group header
    txt2 = "User-agent: a\nUser-agent: indigo-spark\nDisallow: /q\n"
    assert not robots_allowed_rfc("https://h/q", txt2, "indigo-spark")
    # rules before any user-agent line are ignored
    assert robots_allowed_rfc("https://h/x", "Disallow: /\n")
    # empty Disallow value = no rule
    assert robots_allowed_rfc("https://h/x", "User-agent: *\nDisallow:\n")
    # None / empty text allow
    assert robots_allowed_rfc("https://h/x", None)
    assert robots_allowed_rfc("https://h/x", "")
    # comments cut
    assert not robots_allowed_rfc(
        "https://h/x", "User-agent: * # all\nDisallow: /x # block\n"
    )


def test_empty_user_agent_line_is_ignored():
    # a valueless `User-agent:` line (common real-web malformation) must
    # not form a group: "" is a substring of EVERY configured agent, so
    # honoring it would mint a universal "specific" group that suppresses
    # the `*` group and flips the host's verdicts
    txt = "User-agent: *\nAllow: /\nUser-agent:\nDisallow: /\n"
    assert robots_allowed_rfc("https://h/x", txt)
    assert robots_allowed_rfc("https://h/x", txt, "anybot")
    # the malformed group's rules are dropped entirely, not re-attached
    assert robots_allowed_rfc("https://h/x", "User-agent:\nDisallow: /\n")
    # a valid agent in the same run still collects the rules
    txt2 = "User-agent:\nUser-agent: indigo-spark\nDisallow: /q\n"
    assert not robots_allowed_rfc("https://h/q", txt2, "indigo-spark")
    assert robots_allowed_rfc("https://h/q", txt2, "otherbot")
    # and the * group still applies to agents the specific group misses
    txt3 = "User-agent: indigo\nDisallow: /a\nUser-agent:\nUser-agent: *\nDisallow: /b\n"
    assert not robots_allowed_rfc("https://h/b/x", txt3, "otherbot")
    assert robots_allowed_rfc("https://h/a/x", txt3, "otherbot")


def test_divergence_from_stdlib_and_plain_prefix_parity():
    # THE rule the knob exists for: stdlib prefix-matches the literal
    # "/*.pdf$" and never blocks a real pdf; RFC wildcard matching does
    txt = "User-agent: *\nDisallow: /*.pdf$\n"
    assert robots_allowed("https://h/a/x.pdf", txt)          # stdlib: allowed
    assert not robots_allowed_rfc("https://h/a/x.pdf", txt)  # rfc: denied
    # plain prefix rules (no wildcards): both matchers agree on the
    # fixture-style battery, so flipping the knob on a wildcard-free
    # robots corpus is a no-op. (Allow listed first: stdlib applies rules
    # in FILE order while RFC applies longest-first — with the specific
    # rule first the two orders coincide, which is exactly how the
    # fixtures' robots texts are written.)
    plain = "User-agent: *\nAllow: /private/pub\nDisallow: /private\n"
    for url in (
        "https://h/", "https://h/private", "https://h/private/x",
        "https://h/private/pub", "https://h/private/pub/d", "https://h/pub",
    ):
        assert robots_allowed(url, plain) == robots_allowed_rfc(url, plain), url


# ---------------------------------------------------------------------------
# engine vs oracle with the knob enabled
# ---------------------------------------------------------------------------
LEAF = b"<html><body><p>leaf words</p></body></html>"

N_ROUNDS = 2

RW_HOST = "rw.example.org"
RW_ROBOTS = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /cgi/*?id=\n"


def _rw_bundle():
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page(f"https://{RW_HOST}/doc.pdf", LEAF),
        page(f"https://{RW_HOST}/cgi/run?id=7", LEAF),
        page(f"https://{RW_HOST}/article", LEAF),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": f"https://{RW_HOST}/doc.pdf", "seed_rank": next_rank},
        {"url": f"https://{RW_HOST}/cgi/run?id=7", "seed_rank": next_rank + 1},
        {"url": f"https://{RW_HOST}/article", "seed_rank": next_rank + 2},
    ]
    from indigo_crawler_spark.kernels.keys import host_hash

    robots = fb["robots"] + [
        {
            "host": RW_HOST,
            "host_hash": host_hash(RW_HOST),
            "robots_txt": RW_ROBOTS,
            "fetched_ts": _TS,
        }
    ]
    return {**fb, "pages": pages, "seeds": seeds, "robots": robots}


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


def _emitted(state):
    out = []
    for r in range(N_ROUNDS):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        out += [row["canon_url"] for row in df.orderBy("global_rank").collect()]
    return out


def test_wildcards_engine_vs_oracle(spark, tmp_path):
    fb = _rw_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        robots_wildcards_enabled=True,
    )
    state, manifests, oc, results = _run_both(spark, tmp_path / "on", cfg, fb)
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
    emitted = _emitted(state)
    # both wildcard-matching seeds dropped at the gate, counted
    assert f"https://{RW_HOST}/doc.pdf" not in emitted
    assert f"https://{RW_HOST}/cgi/run?id=7" not in emitted
    assert f"https://{RW_HOST}/article" in emitted
    total_denied = sum(m["counters"]["robots_denied"] for m in manifests)
    want_denied = sum(r.counters["robots_denied"] for r in results)
    assert total_denied == want_denied >= 2


def test_flag_off_stdlib_prefix_semantics(spark, tmp_path):
    """Inertness, stated positively: with the knob off the stdlib matcher
    treats '/*.pdf$' as a literal prefix that matches nothing real, so the
    same bundle schedules both urls — and engine still matches oracle."""
    fb = _rw_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, oc, results = _run_both(spark, tmp_path / "off", cfg, fb)
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
    emitted = _emitted(state)
    assert f"https://{RW_HOST}/doc.pdf" in emitted
    assert f"https://{RW_HOST}/article" in emitted


def test_config_hash_extension():
    base = CrawlConfig()
    on = CrawlConfig(robots_wildcards_enabled=True)
    assert "robots_wildcards_enabled" not in base._hash_dict()
    assert on._hash_dict()["robots_wildcards_enabled"] is True
    assert base.config_hash() != on.config_hash()
