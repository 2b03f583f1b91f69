"""rel=canonical honoring (SEMANTICS.md §Canonical link, default OFF):

- kernel capture rules: first-wins among usable links, rel token-list
  matching, skip-subtree exclusion, relative-href resolution, junk-scheme
  NULL, text/link byte-identity;
- engine ≡ oracle crawl: counters (incl. canonical_variants) match and the
  crawl ordering is IDENTICAL to a flag-off crawl (canonical never touches
  scheduling);
- export collapse: variants with present targets leave (chains collapse in
  one pass), orphan variants and self-canonical rows stay, the manifest
  counts, the column does not ship;
- incremental extend: a round-1 variant collapses against a target living
  in a bucket the extend never rewrites (cross-bucket presence read);
- flag-off inert + config_hash extension behaviour.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.textextract import (
    canonical_target,
    extract_text_and_links,
    extract_text_links_signals,
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


def _html(body: bytes, head: bytes = b"") -> bytes:
    return b"<html><head>" + head + b"</head><body>" + body + b"</body></html>"


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_canonical_capture_rules():
    base = "https://h1.example.org/page"

    def canon_of(head: bytes):
        _, _, _, _, c, _, _, _ = extract_text_links_signals(
            _html(b"<p>x</p>", head), base
        )
        return c

    assert canon_of(b"") is None
    assert (
        canon_of(b'<link rel="canonical" href="https://h1.example.org/c">')
        == "https://h1.example.org/c"
    )
    # relative href resolves against the page url
    assert canon_of(b'<link rel="canonical" href="/c2">') == (
        "https://h1.example.org/c2"
    )
    # rel is a case-insensitive token list
    assert canon_of(b'<link rel="Alternate CANONICAL" href="/c3">') == (
        "https://h1.example.org/c3"
    )
    assert canon_of(b'<link rel="alternate" href="/no">') is None
    # first usable link wins; a canonical link without href does not consume
    assert canon_of(
        b'<link rel="canonical"><link rel="canonical" href="/first">'
        b'<link rel="canonical" href="/second">'
    ) == "https://h1.example.org/first"
    # junk scheme -> canonicalize_url rejects -> None
    assert canon_of(b'<link rel="canonical" href="ftp://h1/x">') is None
    # inside a skipped subtree: never matches
    _, _, _, _, c, _, _, _ = extract_text_links_signals(
        b"<html><body><script>"
        b'<link rel="canonical" href="/evil">'
        b"</script><p>t</p></body></html>",
        base,
    )
    assert c is None


def test_kernel_byte_identity_with_canonical():
    page = _html(
        b'<p>words</p><a href="/child">c</a>',
        b'<link rel="canonical" href="/canon">',
    )
    base = "https://h1.example.org/page"
    t0, l0 = extract_text_and_links(page, base)
    t1, l1, _, _, c, _, _, _ = extract_text_links_signals(page, base)
    assert (t0, l0) == (t1, l1)
    assert c == "https://h1.example.org/canon"
    assert canonical_target(None, base) is None
    assert canonical_target("  ", base) is None


# ---------------------------------------------------------------------------
# engine vs oracle + export collapse
# ---------------------------------------------------------------------------
def _canonical_bundle():
    """TINY plus seeded pages: a variant → /canon (present), an orphan
    variant → /missing (absent), a chain a→b→c, a self-canonical page, and
    a hub whose round-1 child declares a cross-host canonical (for the
    incremental test)."""
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    link = lambda target: b'<link rel="canonical" href="' + target + b'">'  # noqa: E731
    pages = fb["pages"] + [
        page("https://h1.example.org/canon", _html(b"<p>the canonical text</p>")),
        page(
            "https://h1.example.org/variant",
            _html(b"<p>variant text</p>", link(b"/canon")),
        ),
        page(
            "https://h1.example.org/orphan",
            _html(b"<p>orphan text</p>", link(b"/missing")),
        ),
        page("https://h1.example.org/a", _html(b"<p>a</p>", link(b"/b"))),
        page("https://h1.example.org/b", _html(b"<p>b</p>", link(b"/c"))),
        page("https://h1.example.org/c", _html(b"<p>c</p>")),
        page(
            "https://h1.example.org/selfy",
            _html(b"<p>self text</p>", link(b"/selfy")),
        ),
        # round-1 cross-host variant: seeded hub on h2 links to a child
        # whose canonical points at h1's /canon (a different pk bucket)
        page(
            "https://h2.example.org/hub",
            _html(b'<p>hub</p><a href="/late-variant">v</a>'),
        ),
        page(
            "https://h2.example.org/late-variant",
            _html(
                b"<p>late variant</p>",
                link(b"https://h1.example.org/canon"),
            ),
        ),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    new_urls = [
        "https://h1.example.org/canon",
        "https://h1.example.org/variant",
        "https://h1.example.org/orphan",
        "https://h1.example.org/a",
        "https://h1.example.org/b",
        "https://h1.example.org/c",
        "https://h1.example.org/selfy",
        "https://h2.example.org/hub",
    ]
    seeds = fb["seeds"] + [
        {"url": u, "seed_rank": next_rank + i} for i, u in enumerate(new_urls)
    ]
    return {**fb, "pages": pages, "seeds": seeds}


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
        (r, row["canon_url"], row["global_rank"])
        for r in range(n_rounds)
        for row in state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        .orderBy("global_rank")
        .collect()
    ]
    return state, manifests, emitted


def test_canonical_engine_vs_oracle_and_collapse(spark, tmp_path):
    fb = _canonical_bundle()
    # default_budget is 8 and h1 carries many seeds: raise it so every
    # handcrafted page is fetched within two rounds
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        default_budget=32, rel_canonical_enabled=True,
    )
    state, manifests, emitted = _crawl(spark, tmp_path / "on", fb, cfg, 2)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(2)

    variants_total = 0
    for r in range(2):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        variants_total += manifests[r]["counters"]["canonical_variants"]
    # variant, orphan, a, b, late-variant declare foreign targets
    assert variants_total == 5

    # the crawl itself is untouched: flag-off run emits the identical order
    cfg_off = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        default_budget=32,
    )
    _, _, emitted_off = _crawl(spark, tmp_path / "off", fb, cfg_off, 2)
    assert emitted == emitted_off

    # oracle's collapse map
    assert oc.canonical == {
        "https://h1.example.org/variant": "https://h1.example.org/canon",
        "https://h1.example.org/orphan": "https://h1.example.org/missing",
        "https://h1.example.org/a": "https://h1.example.org/b",
        "https://h1.example.org/b": "https://h1.example.org/c",
        "https://h2.example.org/late-variant": "https://h1.example.org/canon",
    }

    # full export: present-target variants leave (chain collapses in one
    # pass), orphan + self-canonical stay, column does not ship
    out = str(tmp_path / "corpus")
    export_corpus(state, out)
    df = spark.read.parquet(out)
    assert "canonical_url" not in df.columns
    urls = {row["canon_url"] for row in df.collect()}
    assert "https://h1.example.org/variant" not in urls
    assert "https://h1.example.org/a" not in urls  # chain: b present pre-collapse
    assert "https://h1.example.org/b" not in urls
    assert "https://h1.example.org/c" in urls
    assert "https://h1.example.org/canon" in urls
    assert "https://h1.example.org/orphan" in urls  # target never fetched
    assert "https://h1.example.org/selfy" in urls
    assert "https://h2.example.org/late-variant" not in urls
    man = _read_export_manifest(out)
    # variant, a, b, late-variant have present targets; orphan's is absent
    assert man["canonical_collapsed"] == 4

    # expected set from the oracle: fetched minus collapsed variants
    fetched = {u for r in results for u in r.texts}
    want = {
        u
        for u in fetched
        if not (oc.canonical.get(u) in fetched and u in oc.canonical)
    }
    assert urls == want


def test_canonical_incremental_cross_bucket(spark, tmp_path):
    """Export through round 0 (full: contains h1/canon), then extend through
    round 1 — the round-1 h2 variant must collapse against the h1 target
    that lives in a bucket the extend never rewrites."""
    fb = _canonical_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        default_budget=32, rel_canonical_enabled=True,
    )
    state, _, emitted = _crawl(spark, tmp_path / "crawl", fb, cfg, 2)
    late = "https://h2.example.org/late-variant"
    assert late in [u for (_r, u, _g) in emitted]

    out = str(tmp_path / "corpus")
    r0 = export_corpus(state, out, through_round=0)
    urls0 = {row["canon_url"] for row in spark.read.parquet(out).collect()}
    assert "https://h1.example.org/canon" in urls0
    assert late not in urls0  # not fetched yet

    r1 = export_corpus(state, out, through_round=1)
    assert r1["mode"] == "incremental"
    urls1 = {row["canon_url"] for row in spark.read.parquet(out).collect()}
    assert late not in urls1, "cross-bucket canonical target must collapse it"
    # everything round 1 fetched WITHOUT a present-target canonical arrived
    assert urls1 > urls0 - {late}
    assert r1["rows"] == len(urls1)


def test_canonical_flag_off_inert_and_hash():
    base = CrawlConfig()
    on = CrawlConfig(rel_canonical_enabled=True)
    assert "rel_canonical_enabled" not in base._hash_dict()
    assert on._hash_dict()["rel_canonical_enabled"] is True
    assert base.config_hash() != on.config_hash()
