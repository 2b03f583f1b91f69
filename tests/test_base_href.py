"""<base href> honor (SEMANTICS.md §Text + link extraction, base-honor
note): the first base element rebases relative anchors, rel=canonical, and
meta-refresh targets; base-less documents are byte-for-byte unchanged; the
engine ≡ oracle crawl reaches a page only addressable through the base."""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.textextract import (
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
PAGE = "https://h1.example.org/deep/dir/page"


def _html(body: bytes, head: bytes = b"") -> bytes:
    return b"<html><head>" + head + b"</head><body>" + body + b"</body></html>"


def test_base_rebases_anchors():
    # without base: relative href resolves against the page url's directory
    no_base = _html(b'<a href="leaf">x</a><p>words</p>')
    t0, l0 = extract_text_and_links(no_base, PAGE)
    assert l0 == ["https://h1.example.org/deep/dir/leaf"]
    # absolute base: resolves against the declared base instead
    based = _html(
        b'<a href="leaf">x</a><p>words</p>',
        b'<base href="https://h2.example.org/root/">',
    )
    t1, l1 = extract_text_and_links(based, PAGE)
    assert l1 == ["https://h2.example.org/root/leaf"]
    assert t0 == t1  # the base element contributes no text
    # relative base: itself resolved against the page url first
    rel = _html(b'<a href="leaf">x</a>', b'<base href="../up/">')
    _, l2 = extract_text_and_links(rel, PAGE)
    assert l2 == ["https://h1.example.org/deep/up/leaf"]
    # only the FIRST base with an href counts; href-less base is skipped
    multi = _html(
        b'<a href="leaf">x</a>',
        b"<base>"
        b'<base href="https://h3.example.org/a/">'
        b'<base href="https://h4.example.org/b/">',
    )
    _, l3 = extract_text_and_links(multi, PAGE)
    assert l3 == ["https://h3.example.org/a/leaf"]
    # absolute hrefs are untouched by base
    abs_href = _html(
        b'<a href="https://h5.example.org/x">x</a>',
        b'<base href="https://h2.example.org/root/">',
    )
    _, l4 = extract_text_and_links(abs_href, PAGE)
    assert l4 == ["https://h5.example.org/x"]


def test_base_rebases_canonical_and_refresh():
    head = (
        b'<base href="https://h2.example.org/root/">'
        b'<link rel="canonical" href="canon-leaf">'
        b'<meta http-equiv="refresh" content="0;url=moved-leaf">'
    )
    _, _, _, _, canon, refresh, _, _ = extract_text_links_signals(
        _html(b"<p>t</p>", head), PAGE
    )
    assert canon == "https://h2.example.org/root/canon-leaf"
    assert refresh == (0, "https://h2.example.org/root/moved-leaf")
    # refresh SELF detection compares against the PAGE url, not the base:
    # a refresh resolving to the page itself through the base is a reload
    head2 = (
        b'<base href="https://h1.example.org/deep/dir/">'
        b'<meta http-equiv="refresh" content="0;url=page">'
    )
    _, _, _, _, _, refresh2, _, _ = extract_text_links_signals(
        _html(b"<p>t</p>", head2), PAGE
    )
    assert refresh2 is None


def test_base_engine_vs_oracle(spark, tmp_path):
    """A seeded page whose only link is relative-through-base: the target
    exists solely at the base-resolved url, so reaching it proves both
    engines honor the base identically (ordering + counters match)."""
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page(
            "https://h1.example.org/based-hub",
            _html(
                b'<a href="only-via-base">x</a><p>hub</p>',
                b'<base href="https://h1.example.org/cdn/">',
            ),
        ),
        page("https://h1.example.org/cdn/only-via-base", _html(b"<p>leaf</p>")),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": "https://h1.example.org/based-hub", "seed_rank": next_rank}
    ]
    budgets = [
        {**b, "budget": 64} if b["host"] == "h1.example.org" else b
        for b in fb["host_budgets"]
    ]
    fb = {**fb, "pages": pages, "seeds": seeds, "host_budgets": budgets}

    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        default_budget=64,
    )
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, 2)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(2)
    emitted = []
    for r in range(2):
        got = [
            (row["canon_url"], row["global_rank"])
            for row in state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
            .orderBy("global_rank")
            .collect()
        ]
        want = [(e["canon_url"], e["global_rank"]) for e in results[r].emitted]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        emitted += [u for u, _ in got]
    assert "https://h1.example.org/cdn/only-via-base" in emitted
