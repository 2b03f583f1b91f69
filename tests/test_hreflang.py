"""Hreflang alternate discovery (SEMANTICS.md §Hreflang alternates,
default OFF) — language variants of a page join discovery through
``<link rel="alternate" hreflang>``:

- kernel semantics: collection gated on rel token + non-blank hreflang +
  href, document order, anchor-style resolution (effective base +
  canonicalization), self-pointers and duplicates dropped;
- flag-off byte-identity: the text/link byte streams are untouched by the
  collection (alternates ride a separate tuple slot);
- engine ≡ oracle crawl with the knob enabled: variants that no <a> links
  to are discovered, scheduled, and counted ``hreflang_alternates``; with
  the knob off the same bundle never discovers them and the counter key
  is absent;
- config_hash extension behaviour pins resumability.
"""

from __future__ import annotations

from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.textextract import (
    extract_text_and_links,
    extract_text_links_signals,
    hreflang_targets,
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

BASE = "https://hl.example.org/en/page"

CLUSTER = (
    b"<html><head>"
    b'<link rel="alternate" hreflang="en" href="https://hl.example.org/en/page">'  # self
    b'<link rel="Alternate" hreflang="fr" href="/fr/page">'                        # relative + case
    b'<link rel="alternate" hreflang="de-AT" href="https://hl.example.org/de/page">'
    b'<link rel="alternate" hreflang="x-default" href="https://hl.example.org/de/page">'  # dup
    b'<link rel="alternate" type="application/rss+xml" href="/feed.xml">'          # no hreflang
    b'<link rel="alternate" hreflang="  " href="/blank">'                          # blank hreflang
    b'<link rel="alternate" hreflang="es">'                                        # no href
    b"</head><body>"
    b'<a href="https://hl.example.org/article/1">a</a><p>hub words</p>'
    b"</body></html>"
)


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_kernel_collection_and_resolution():
    t, ls, ni, nf, cu, rf, ad, alts = extract_text_links_signals(
        CLUSTER, BASE, hreflang=True
    )
    # the knob gates the resolution work itself: off → no alternates
    assert extract_text_links_signals(CLUSTER, BASE)[7] == []
    # document order; self dropped; dup dropped; non-hreflang/blank/
    # href-less alternates ignored; relative href resolved against BASE
    assert alts == [
        "https://hl.example.org/fr/page",
        "https://hl.example.org/de/page",
    ]
    # the anchor stream is untouched by collection
    assert ls == ["https://hl.example.org/article/1"]
    # flag-off byte-identity with the plain extractor
    t0, l0 = extract_text_and_links(CLUSTER, BASE)
    assert (t, ls) == (t0, l0)


def test_kernel_base_href_and_helper():
    page = (
        b'<html><head><base href="https://cdn.example.org/x/">'
        b'<link rel="alternate" hreflang="fr" href="fr.html">'
        b"</head><body><p>w</p></body></html>"
    )
    *_, alts = extract_text_links_signals(page, BASE, hreflang=True)
    # resolution uses the document's effective base, like anchors do
    assert alts == ["https://cdn.example.org/x/fr.html"]
    # helper direct: self judged against page_url, duplicates keep first
    got = hreflang_targets(
        ["/a", "/b", "/a", BASE], "https://hl.example.org/", page_url=BASE
    )
    assert got == ["https://hl.example.org/a", "https://hl.example.org/b"]
    # empty input → empty output
    assert hreflang_targets([], BASE) == []


# ---------------------------------------------------------------------------
# engine vs oracle with the knob enabled
# ---------------------------------------------------------------------------
LEAF = b"<html><body><p>leaf words</p></body></html>"

N_ROUNDS = 3


def _hl_bundle():
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page(BASE, CLUSTER),
        page("https://hl.example.org/article/1", LEAF),
        # the variants exist in the store but NOTHING anchor-links to them —
        # only the hreflang cluster can discover them
        page("https://hl.example.org/fr/page", LEAF),
        page("https://hl.example.org/de/page", LEAF),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [{"url": BASE, "seed_rank": next_rank}]
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


def test_hreflang_engine_vs_oracle(spark, tmp_path):
    fb = _hl_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        hreflang_enabled=True,
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

    # the cluster page contributed exactly its 2 surviving alternates
    # (self + dup + malformed dropped), in whichever round it was fetched
    assert sum(m["counters"]["hreflang_alternates"] for m in manifests) == 2
    # the variants were discovered and crawled despite no anchor pointing
    # at them
    assert "https://hl.example.org/fr/page" in emitted
    assert "https://hl.example.org/de/page" in emitted
    assert BASE in emitted


def test_flag_off_never_discovers(spark, tmp_path):
    """Inertness, stated positively: with the knob off the same bundle
    never discovers the variants (nothing anchor-links to them), the
    counter key is absent from every manifest, and engine still matches
    oracle."""
    fb = _hl_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, oc, results = _run_both(spark, tmp_path / "off", cfg, fb)
    emitted = []
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "hreflang_alternates" not in manifests[r]["counters"]
        emitted += [
            row["canon_url"]
            for row in state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            ).collect()
        ]
    assert BASE in emitted
    assert "https://hl.example.org/fr/page" not in emitted
    assert "https://hl.example.org/de/page" not in emitted


def test_config_hash_extension():
    """Default-off is hash-absent (pre-flag state dirs keep resuming);
    flipping the knob on changes the hash like every semantic knob."""
    base = CrawlConfig()
    on = CrawlConfig(hreflang_enabled=True)
    assert "hreflang_enabled" not in base._hash_dict()
    assert on._hash_dict()["hreflang_enabled"] is True
    assert base.config_hash() != on.config_hash()
