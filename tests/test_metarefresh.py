"""Meta-refresh redirect following (SEMANTICS.md §Meta refresh, default OFF):

- kernel grammar battery: delay parsing, url= key matching, quote
  stripping, self-target reload, junk rejection, first-wins, skip-subtree
  exclusion, text/link byte-identity;
- engine ≡ oracle crawl: a page reachable ONLY through a pure redirect
  gets crawled with the flag on and never with it off; counters (incl.
  refresh_redirects) match;
- nofollow composition: a nofollow page's refresh target is withheld;
- export drops pure redirects (delayed refreshes stay) and records
  ``redirects_dropped``;
- config_hash extension behaviour.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.textextract import (
    extract_text_and_links,
    extract_text_links_signals,
    meta_refresh_target,
)
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.export import (
    _read_export_manifest,
    export_corpus,
)
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
BASE = "https://h1.example.org/page"


def _html(body: bytes, head: bytes = b"") -> bytes:
    return b"<html><head>" + head + b"</head><body>" + body + b"</body></html>"


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_refresh_grammar():
    t = lambda c: meta_refresh_target(c, BASE)  # noqa: E731
    assert t(None) is None
    assert t("") is None
    assert t("0") is None                         # no url part: reload
    assert t("0;url=/target") == (0, "https://h1.example.org/target")
    assert t("5; URL=/target") == (5, "https://h1.example.org/target")
    assert t("3;url='https://h2.example.org/x'") == (
        3,
        "https://h2.example.org/x",
    )
    assert t('0; url = "/q"') is None             # spaces around '=' not in grammar
    assert t('0;url="/q"') == (0, "https://h1.example.org/q")
    assert t("0 ;url=/t") == (0, "https://h1.example.org/t")  # delay trimmed
    assert t("abc;url=/t") is None                # non-numeric delay
    assert t("-1;url=/t") is None                 # sign not a digit
    assert t("0;/t") is None                      # missing url= key
    assert t("0;url=ftp://x/y") is None           # junk scheme rejected
    assert t("0;url=/page") is None               # self target: reload
    assert t("0;url=") is None                    # empty target


def test_refresh_capture_and_byte_identity():
    page = _html(
        b'<p>redirecting</p><a href="/child">c</a>',
        b'<meta http-equiv="Refresh" content="0;url=/moved">'
        b'<meta http-equiv="refresh" content="9;url=/second">',
    )
    t0, l0 = extract_text_and_links(page, BASE)
    t1, l1, _, _, _, rf, _, _ = extract_text_links_signals(page, BASE)
    assert (t0, l0) == (t1, l1)  # the kernel never mutates text/links
    assert rf == (0, "https://h1.example.org/moved")  # first wins
    # inside a skipped subtree: never matches
    _, _, _, _, _, rf2, _, _ = extract_text_links_signals(
        b"<html><body><noscript>"
        b'<meta http-equiv="refresh" content="0;url=/evil">'
        b"</noscript><p>t</p></body></html>",
        BASE,
    )
    assert rf2 is None


# ---------------------------------------------------------------------------
# engine vs oracle + export
# ---------------------------------------------------------------------------
def _refresh_bundle():
    """TINY plus seeded pages: a delay-0 pure redirect to a page that exists
    ONLY behind it, a delay-5 content page with a refresh target, and a
    nofollow page whose refresh target must be withheld."""
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page(
            "https://h1.example.org/moved-src",
            _html(
                b"<p>moved permanently</p>",
                b'<meta http-equiv="refresh" content="0;url=/moved-dst">',
            ),
        ),
        page("https://h1.example.org/moved-dst", _html(b"<p>the destination</p>")),
        page(
            "https://h1.example.org/slow-refresh",
            _html(
                b"<p>real content that also refreshes</p>",
                b'<meta http-equiv="refresh" content="30;url=/slow-dst">',
            ),
        ),
        page("https://h1.example.org/slow-dst", _html(b"<p>slow destination</p>")),
        page(
            "https://h1.example.org/nofollow-refresh",
            _html(
                b"<p>nofollow redirect</p>",
                b'<meta name="robots" content="nofollow">'
                b'<meta http-equiv="refresh" content="0;url=/withheld-dst">',
            ),
        ),
        page("https://h1.example.org/withheld-dst", _html(b"<p>unreachable</p>")),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    new_urls = [
        "https://h1.example.org/moved-src",
        "https://h1.example.org/slow-refresh",
        "https://h1.example.org/nofollow-refresh",
    ]
    seeds = fb["seeds"] + [
        {"url": u, "seed_rank": next_rank + i} for i, u in enumerate(new_urls)
    ]
    # the fixture's host_budgets caps h1 below default_budget; raise it so
    # every handcrafted child is scheduled within two rounds
    budgets = [
        {**b, "budget": 96} if b["host"] == "h1.example.org" else b
        for b in fb["host_budgets"]
    ]
    return {**fb, "pages": pages, "seeds": seeds, "host_budgets": budgets}


def _crawl(spark, path, fb, cfg, n_rounds):
    state = CrawlState(io=TableIO(spark, str(path)), cfg=cfg)
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


def test_refresh_engine_vs_oracle_and_export(spark, tmp_path):
    fb = _refresh_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        default_budget=96, meta_robots_enabled=True, meta_refresh_enabled=True,
    )
    state, manifests, emitted = _crawl(spark, tmp_path / "on", fb, cfg, 2)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(2)

    redirects_total = 0
    for r in range(2):
        got = [
            (row["canon_url"], row["global_rank"])
            for row in state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            )
            .orderBy("global_rank")
            .collect()
        ]
        want = [(e["canon_url"], e["global_rank"]) for e in results[r].emitted]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        redirects_total += manifests[r]["counters"]["refresh_redirects"]
    # moved-src and nofollow-refresh are pure redirects (delay 0)
    assert redirects_total == 2

    # the redirect target (reachable only through moved-src) was crawled;
    # the delayed target too; the nofollow page's target was withheld
    assert "https://h1.example.org/moved-dst" in emitted
    assert "https://h1.example.org/slow-dst" in emitted
    assert "https://h1.example.org/withheld-dst" not in emitted

    # export: pure redirects leave, delayed refresh pages stay
    out = str(tmp_path / "corpus")
    export_corpus(state, out)
    urls = {row["canon_url"] for row in spark.read.parquet(out).collect()}
    assert "https://h1.example.org/moved-src" not in urls
    assert "https://h1.example.org/nofollow-refresh" not in urls
    assert "https://h1.example.org/moved-dst" in urls
    assert "https://h1.example.org/slow-refresh" in urls
    assert "https://h1.example.org/slow-dst" in urls
    man = _read_export_manifest(out)
    assert man["redirects_dropped"] == 2
    assert oc.redirects == {
        "https://h1.example.org/moved-src",
        "https://h1.example.org/nofollow-refresh",
    }
    fetched = {u for r in results for u in r.texts}
    assert urls == fetched - oc.redirects - oc.noindex


def test_refresh_flag_off_inert(spark, tmp_path):
    """Flag off: the redirect target is unreachable, no counter, no
    redirect column, and the export keeps the pure-redirect page."""
    fb = _refresh_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        default_budget=96,
    )
    state, manifests, emitted = _crawl(spark, tmp_path / "off", fb, cfg, 2)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(2)
    for r in range(2):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "refresh_redirects" not in manifests[r]["counters"]
    assert "https://h1.example.org/moved-dst" not in emitted
    df = state.io.read("fetched_text/round=0", schemas.FETCHED_TEXT)
    assert df.columns == ["canon_url", "text"]
    out = str(tmp_path / "corpus_off")
    export_corpus(state, out)
    urls = {row["canon_url"] for row in spark.read.parquet(out).collect()}
    assert "https://h1.example.org/moved-src" in urls
    assert "redirects_dropped" not in _read_export_manifest(out)


def test_refresh_config_hash_extension():
    base = CrawlConfig()
    on = CrawlConfig(meta_refresh_enabled=True)
    assert "meta_refresh_enabled" not in base._hash_dict()
    assert on._hash_dict()["meta_refresh_enabled"] is True
    assert base.config_hash() != on.config_hash()
