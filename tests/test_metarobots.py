"""REP meta-robots honoring (SEMANTICS.md §Meta robots, default OFF):

- kernel semantics: directive parsing (case, whitespace, ``none``, unknown
  tokens, first-meta-wins, name case-insensitivity) and text/link
  byte-identity with the flag-less extraction;
- engine ≡ oracle crawl where a nofollow hub's children are withheld from
  discovery (and counted), while a followable hub's children are crawled;
- flag OFF is inert: the same corpus crawls the nofollow children;
- the corpus export drops noindex pages (latest fetch wins) and records
  ``noindex_dropped`` in the manifest;
- config_hash extension behaviour.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.textextract import (
    extract_text_and_links,
    extract_text_links_robots,
    meta_robots_flags,
)
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.export import export_corpus
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

NOFOLLOW_HUB = (
    b'<html><head><meta name="robots" content="nofollow"></head><body>'
    b"<p>hub with withheld links</p>"
    b'<a href="https://h1.example.org/nf-child-a">a</a>'
    b'<a href="https://h1.example.org/nf-child-b">b</a>'
    b"</body></html>"
)

FOLLOW_HUB = (
    b"<html><head></head><body><p>plain hub</p>"
    b'<a href="https://h1.example.org/ok-child">c</a></body></html>'
)

NOINDEX_PAGE = (
    b'<html><head><meta name="ROBOTS" content=" NoIndex , follow "></head>'
    b"<body><p>secret but followable</p>"
    b'<a href="https://h1.example.org/ok-child">c</a></body></html>'
)

CHILD = b"<html><body><p>leaf words</p></body></html>"


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_meta_robots_flags_directives():
    assert meta_robots_flags({}) == (False, False)
    assert meta_robots_flags({"robots": "noindex"}) == (True, False)
    assert meta_robots_flags({"robots": "nofollow"}) == (False, True)
    assert meta_robots_flags({"robots": "noindex,nofollow"}) == (True, True)
    assert meta_robots_flags({"robots": " NOINDEX , NoFollow "}) == (True, True)
    assert meta_robots_flags({"robots": "none"}) == (True, True)
    assert meta_robots_flags({"robots": "all"}) == (False, False)
    assert meta_robots_flags({"robots": "index, follow"}) == (False, False)
    assert meta_robots_flags({"robots": "noarchive, nosnippet"}) == (False, False)
    # name is case-insensitive; description meta does not leak in
    assert meta_robots_flags({"ROBOTS": "noindex"}) == (True, False)
    assert meta_robots_flags({"description": "noindex"}) == (False, False)
    # first robots meta wins (insertion order == document order)
    assert meta_robots_flags({"Robots": "noindex", "robots": "nofollow"}) == (
        True,
        False,
    )


def test_kernel_byte_identity_and_flags():
    base = "https://h1.example.org/hub"
    t0, l0 = extract_text_and_links(NOFOLLOW_HUB, base)
    t1, l1, ni, nf = extract_text_links_robots(NOFOLLOW_HUB, base)
    assert (t0, l0) == (t1, l1)  # same parse, additive flags
    assert (ni, nf) == (False, True)
    assert l1 == [
        "https://h1.example.org/nf-child-a",
        "https://h1.example.org/nf-child-b",
    ]
    t2, l2, ni2, nf2 = extract_text_links_robots(NOINDEX_PAGE, base)
    assert (ni2, nf2) == (True, False)
    assert extract_text_and_links(NOINDEX_PAGE, base) == (t2, l2)
    assert extract_text_links_robots(None, base) == ("", [], False, False)
    # sitemap documents carry no meta under the sitemap branch
    sm = b"<urlset><url><loc>https://h1.example.org/x</loc></url></urlset>"
    assert extract_text_links_robots(sm, base, sitemap_aware=True) == (
        "",
        ["https://h1.example.org/x"],
        False,
        False,
    )


# ---------------------------------------------------------------------------
# engine vs oracle
# ---------------------------------------------------------------------------
def _robots_bundle():
    """TINY plus: a seeded nofollow hub (its two children exist ONLY through
    it), a seeded followable hub (one child), and a seeded noindex page."""
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page("https://h1.example.org/nf-hub", NOFOLLOW_HUB),
        page("https://h1.example.org/nf-child-a", CHILD),
        page("https://h1.example.org/nf-child-b", CHILD),
        page("https://h1.example.org/ok-hub", FOLLOW_HUB),
        page("https://h1.example.org/ok-child", CHILD),
        page("https://h1.example.org/secret", NOINDEX_PAGE),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": "https://h1.example.org/nf-hub", "seed_rank": next_rank},
        {"url": "https://h1.example.org/ok-hub", "seed_rank": next_rank + 1},
        {"url": "https://h1.example.org/secret", "seed_rank": next_rank + 2},
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


def test_meta_robots_engine_vs_oracle_and_export(spark, tmp_path):
    fb = _robots_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        meta_robots_enabled=True,
    )
    state, manifests, emitted = _crawl(spark, tmp_path / "on", fb, cfg, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)

    nofollow_seen = 0
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
        nofollow_seen += manifests[r]["counters"]["nofollow_dropped"]
    assert nofollow_seen >= 2, "the nofollow hub's two links must be counted"

    # the hubs and the noindex page were crawled; the followable child was
    # discovered; the nofollow children never entered the frontier
    assert "https://h1.example.org/nf-hub" in emitted
    assert "https://h1.example.org/secret" in emitted
    assert "https://h1.example.org/ok-child" in emitted
    assert "https://h1.example.org/nf-child-a" not in emitted
    assert "https://h1.example.org/nf-child-b" not in emitted

    # fetched_text still records the nofollow/noindex pages' text
    # byte-identically (noindex governs the corpus, not the crawl)
    texts = {
        row["canon_url"]: row["text"]
        for r in range(N_ROUNDS)
        for row in state.io.read(
            f"fetched_text/round={r}", schemas.FETCHED_TEXT_ROBOTS
        ).collect()
    }
    want_secret, _ = extract_text_and_links(
        NOINDEX_PAGE, "https://h1.example.org/secret"
    )
    assert texts["https://h1.example.org/secret"] == want_secret

    # export honors noindex: the secret page is out, the manifest counts it,
    # every other fetched url is in
    out = str(tmp_path / "corpus")
    res = export_corpus(state, out)
    corpus_urls = {
        row["canon_url"] for row in spark.read.parquet(out).collect()
    }
    assert "https://h1.example.org/secret" not in corpus_urls
    assert "https://h1.example.org/nf-hub" in corpus_urls
    assert "https://h1.example.org/ok-child" in corpus_urls
    from indigo_crawler_spark.plans.export import _read_export_manifest

    man = _read_export_manifest(out)
    assert man["noindex_dropped"] == 1
    fetched = {u for r in results for u in r.texts}
    assert res["rows"] == len(corpus_urls) == len(fetched - oc.noindex)

    # the DATA decides, not the export invocation's config: an --export run
    # without the flag over a meta_robots crawl still honors noindex
    # (footer-schema sniff — SEMANTICS.md §Meta robots)
    plain_state = CrawlState(io=TableIO(spark, str(tmp_path / "on")))
    out2 = str(tmp_path / "corpus_plaincfg")
    export_corpus(plain_state, out2)
    urls2 = {row["canon_url"] for row in spark.read.parquet(out2).collect()}
    assert urls2 == corpus_urls
    assert oc.noindex == {"https://h1.example.org/secret"}


def test_meta_robots_flag_off_inert(spark, tmp_path):
    """Same corpus, flag off: the nofollow children ARE discovered and
    crawled, no nofollow_dropped counter exists, fetched_text has no
    noindex column, and the export keeps the noindex page."""
    fb = _robots_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, emitted = _crawl(spark, tmp_path / "off", fb, cfg, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "nofollow_dropped" not in manifests[r]["counters"]
    assert "https://h1.example.org/nf-child-a" in emitted
    assert "https://h1.example.org/nf-child-b" in emitted
    df = state.io.read("fetched_text/round=0", schemas.FETCHED_TEXT)
    assert df.columns == ["canon_url", "text"]
    out = str(tmp_path / "corpus_off")
    export_corpus(state, out)
    urls = {row["canon_url"] for row in spark.read.parquet(out).collect()}
    assert "https://h1.example.org/secret" in urls
    from indigo_crawler_spark.plans.export import _read_export_manifest

    assert "noindex_dropped" not in _read_export_manifest(out)


def test_config_hash_extension():
    """Default-off is hash-absent (pre-flag state dirs keep resuming);
    flipping the knob on changes the hash like every semantic knob."""
    base = CrawlConfig()
    on = CrawlConfig(meta_robots_enabled=True)
    assert "meta_robots_enabled" not in base._hash_dict()
    assert on._hash_dict()["meta_robots_enabled"] is True
    assert base.config_hash() != on.config_hash()
