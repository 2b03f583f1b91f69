"""Anchor-level rel=nofollow honoring (SEMANTICS.md §Anchor nofollow,
default OFF) — the link-level half of REP, complementing the page-level
meta-robots half:

- kernel semantics: rel token detection (case, token lists, sponsored/ugc
  NOT honored, first-attr-wins), the kept+dropped partition invariant, and
  text/link byte-identity with the flag-less extraction;
- engine ≡ oracle crawl where a child reachable ONLY through a nofollow
  anchor is never discovered (and counted), while the sibling followed
  anchor's child is crawled;
- composition with meta_robots_enabled: the two counters partition the
  withheld set;
- flag OFF is inert: the same corpus crawls the nofollow-anchor child;
- config_hash extension behaviour.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.textextract import (
    anchor_rel_nofollow,
    extract_text_and_links,
    extract_text_links_signals,
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

ANF_HUB = (
    b"<html><body><p>hub with one endorsed and one nofollow link</p>"
    b'<a href="https://h1.example.org/anf-ok">ok</a>'
    b'<a rel="nofollow" href="https://h1.example.org/anf-no">no</a>'
    b"</body></html>"
)

# meta-robots nofollow page that ALSO carries an anchor-level nofollow:
# the anchor drop happens first (anchor_nofollow_dropped), the remaining
# link is then withheld page-level (nofollow_dropped) — the counters
# partition the withheld set (SEMANTICS.md §Anchor nofollow pt 4)
BOTH_HUB = (
    b'<html><head><meta name="robots" content="nofollow"></head><body>'
    b"<p>page-level nofollow with an anchor-level drop inside</p>"
    b'<a href="https://h1.example.org/both-a">a</a>'
    b'<a rel="NoFollow ugc" href="https://h1.example.org/both-b">b</a>'
    b"</body></html>"
)

CHILD = b"<html><body><p>leaf words</p></body></html>"


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_anchor_rel_nofollow_tokens():
    assert anchor_rel_nofollow("nofollow")
    assert anchor_rel_nofollow("NOFOLLOW")
    assert anchor_rel_nofollow(" external NoFollow noopener ")
    assert not anchor_rel_nofollow(None)
    assert not anchor_rel_nofollow("")
    assert not anchor_rel_nofollow("noopener noreferrer")
    # sponsored/ugc are hints qualifying endorsement, not crawl directives
    assert not anchor_rel_nofollow("sponsored ugc")
    # substring of a larger token must not match
    assert not anchor_rel_nofollow("nofollowish")


def test_kernel_partition_and_byte_identity():
    html = (
        b"<html><body><p>hub</p>"
        b'<a href="https://h1.example.org/a">a</a>'
        b'<a rel="nofollow" href="https://h1.example.org/b">b</a>'
        b'<a rel=" NoFollow sponsored " href="https://h1.example.org/c">c</a>'
        b'<a rel="noopener" href="https://h1.example.org/d">d</a>'
        b'<a rel="nofollow" href="ftp://junk/x">junk scheme: counts nowhere</a>'
        b'<a rel="nofollow">no href at all</a>'
        b'<script><a rel="nofollow" href="https://h1.example.org/e">skip</a>'
        b"</script></body></html>"
    )
    base = "https://h1.example.org/hub"
    t0, l0 = extract_text_and_links(html, base)
    t1, l1, ni, nf, cu, rf, ad, _ = extract_text_links_signals(
        html, base, anchor_nofollow=True
    )
    # text is byte-identical; flags untouched by anchor capture
    assert t1 == t0
    assert (ni, nf, cu, rf) == (False, False, None, None)
    assert l1 == ["https://h1.example.org/a", "https://h1.example.org/d"]
    assert ad == 2  # the junk-scheme nofollow anchor counts NOWHERE
    assert len(l1) + ad == len(l0)  # kept + dropped == flag-off links
    # flag OFF through the same signals surface: byte-identical links, 0
    t2, l2, _, _, _, _, ad2, _ = extract_text_links_signals(html, base)
    assert (t2, l2, ad2) == (t0, l0, 0)
    # sitemap documents carry no anchors — the branch returns 0
    sm = b"<urlset><url><loc>https://h1.example.org/x</loc></url></urlset>"
    out = extract_text_links_signals(
        sm, base, sitemap_aware=True, anchor_nofollow=True
    )
    assert out == (
        "", ["https://h1.example.org/x"], False, False, None, None, 0, []
    )


def test_kernel_first_attr_wins():
    # duplicate rel attributes: the FIRST non-None rel governs (mirrors the
    # first-href rule the flag-off stream always had)
    html = b'<a rel="nofollow" rel="noopener" href="https://h1.example.org/p">x</a>'
    _, links, _, _, _, _, ad, _ = extract_text_links_signals(
        html, "https://h1.example.org/", anchor_nofollow=True
    )
    assert links == [] and ad == 1
    html2 = b'<a rel="noopener" rel="nofollow" href="https://h1.example.org/p">x</a>'
    _, links2, _, _, _, _, ad2, _ = extract_text_links_signals(
        html2, "https://h1.example.org/", anchor_nofollow=True
    )
    assert links2 == ["https://h1.example.org/p"] and ad2 == 0


# ---------------------------------------------------------------------------
# engine vs oracle
# ---------------------------------------------------------------------------
def _anf_bundle():
    """TINY plus a seeded hub whose nofollow-anchor child exists ONLY
    through that anchor, and a seeded both-levels hub (meta nofollow AND an
    anchor-level nofollow inside)."""
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page("https://h1.example.org/anf-hub", ANF_HUB),
        page("https://h1.example.org/anf-ok", CHILD),
        page("https://h1.example.org/anf-no", CHILD),
        page("https://h1.example.org/both-hub", BOTH_HUB),
        page("https://h1.example.org/both-a", CHILD),
        page("https://h1.example.org/both-b", CHILD),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": "https://h1.example.org/anf-hub", "seed_rank": next_rank},
        {"url": "https://h1.example.org/both-hub", "seed_rank": next_rank + 1},
    ]
    return {**fb, "pages": pages, "seeds": seeds}


def _crawl(spark, tmp_path, fb, cfg, n_rounds):
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
    emitted = [
        row["canon_url"]
        for r in range(n_rounds)
        for row in state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        .orderBy("global_rank")
        .collect()
    ]
    return state, manifests, emitted


N_ROUNDS = 3


def test_anchor_nofollow_engine_vs_oracle(spark, tmp_path):
    fb = _anf_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        anchor_nofollow_enabled=True,
    )
    state, manifests, emitted = _crawl(spark, tmp_path / "on", fb, cfg, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)

    dropped = 0
    for r in range(N_ROUNDS):
        got = [
            (row["canon_url"], row["rank_in_host"], row["global_rank"])
            for row in state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            )
            .orderBy("global_rank")
            .collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        dropped += manifests[r]["counters"]["anchor_nofollow_dropped"]
    # anf-hub's nofollow anchor + both-hub's anchor-level drop
    assert dropped >= 2

    # the endorsed child was crawled; the nofollow-anchor children
    # (reachable ONLY through those anchors) never entered the frontier.
    # both-a IS crawled here: its hub's PAGE-level meta nofollow needs
    # meta_robots_enabled, which this crawl leaves off — the flags are
    # independent halves of REP (the composition test covers both-on)
    assert "https://h1.example.org/anf-hub" in emitted
    assert "https://h1.example.org/anf-ok" in emitted
    assert "https://h1.example.org/anf-no" not in emitted
    assert "https://h1.example.org/both-a" in emitted
    assert "https://h1.example.org/both-b" not in emitted

    # fetched_text stays the plain two-column table (anchor_dropped is a
    # transient metric column, never persisted) with byte-identical text
    df = state.io.read("fetched_text/round=0", schemas.FETCHED_TEXT)
    assert df.columns == ["canon_url", "text"]
    texts = {row["canon_url"]: row["text"] for row in df.collect()}
    want_hub, _ = extract_text_and_links(
        ANF_HUB, "https://h1.example.org/anf-hub"
    )
    assert texts["https://h1.example.org/anf-hub"] == want_hub


def test_composition_with_meta_robots(spark, tmp_path):
    """Both flags on: the both-hub page's anchor drop is counted in
    anchor_nofollow_dropped and the REMAINING link in nofollow_dropped —
    the counters partition the withheld set, and the oracle agrees on
    every counter every round."""
    fb = _anf_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        anchor_nofollow_enabled=True, meta_robots_enabled=True,
    )
    state, manifests, emitted = _crawl(spark, tmp_path / "both", fb, cfg, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)
    anchor_total = nofollow_total = 0
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        anchor_total += manifests[r]["counters"]["anchor_nofollow_dropped"]
        nofollow_total += manifests[r]["counters"]["nofollow_dropped"]
    # both-hub: 1 anchor-level drop, 1 page-level withheld remainder;
    # anf-hub contributes 1 more anchor-level drop
    assert anchor_total >= 2
    assert nofollow_total >= 1
    assert "https://h1.example.org/both-a" not in emitted
    assert "https://h1.example.org/both-b" not in emitted
    assert "https://h1.example.org/anf-ok" in emitted


def test_flag_off_inert(spark, tmp_path):
    """Same corpus, flag off: the nofollow-anchor child IS discovered and
    crawled, no anchor_nofollow_dropped counter exists, and the counters
    still match the flag-off oracle."""
    fb = _anf_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, emitted = _crawl(spark, tmp_path / "off", fb, cfg, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "anchor_nofollow_dropped" not in manifests[r]["counters"]
    assert "https://h1.example.org/anf-no" in emitted
    assert "https://h1.example.org/both-a" in emitted
    df = state.io.read("fetched_text/round=0", schemas.FETCHED_TEXT)
    assert df.columns == ["canon_url", "text"]


def test_config_hash_extension():
    """Default-off is hash-absent (pre-flag state dirs keep resuming);
    flipping the knob on changes the hash like every semantic knob."""
    base = CrawlConfig()
    on = CrawlConfig(anchor_nofollow_enabled=True)
    assert "anchor_nofollow_enabled" not in base._hash_dict()
    assert on._hash_dict()["anchor_nofollow_enabled"] is True
    assert base.config_hash() != on.config_hash()
