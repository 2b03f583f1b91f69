"""Extension deny gate (SEMANTICS.md §Extension deny, default OFF) — the
html-only crawler's "don't schedule binaries" knob:

- kernel semantics: last-dot rule on the final non-empty path segment,
  case-insensitive on the URL side, dot-files and trailing-dot segments
  carry no extension, empty tuple never matches;
- kernel ≡ column-expr identity on a URL battery covering every edge of
  the normative ``.\\.([^.]+)$`` rule;
- engine ≡ oracle crawl with the gate enabled: the gate site drops a
  denied-extension SEED from the round-0 frontier (counted
  ``ext_excluded``) and the discovery site keeps denied children out of
  the frontier entirely — the trap gate's two-site shape;
- flag-off inertness: empty-tuple crawls keep counters/manifests free of
  the key, and the config_hash extension behaviour pins resumability.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.functions.traps import ext_expr, url_extension_expr
from indigo_crawler_spark.kernels.traps import matches_ext, url_extension
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

# every edge of the normative extension rule (SEMANTICS.md §Extension deny)
URL_BATTERY = [
    ("https://h1.example.org/", ""),                      # no path segments
    ("https://h1.example.org/a/b", ""),                   # no dot
    ("https://h1.example.org/a/img.jpg", "jpg"),
    ("https://h1.example.org/a/IMG.JPG", "jpg"),          # case-insensitive
    ("https://h1.example.org/a/archive.tar.gz", "gz"),    # last dot wins
    ("https://h1.example.org/a/.htaccess", ""),           # dot-file: none
    ("https://h1.example.org/a/file.", ""),               # trailing dot: none
    ("https://h1.example.org/a.zip/page", ""),            # non-final segment
    ("https://h1.example.org/dl.zip/", ""),               # trailing slash: dir
    ("https://h1.example.org/a/x.pdf?dl=1", "pdf"),       # query stripped
    ("https://h1.example.org/a/x.y.z.PnG", "png"),
    ("https://h1.example.org/a/..js", "js"),              # prev char a dot: ok
    ("https://h1.example.org/über/größe.MP3", "mp3"),     # unicode segment
]

EXTS = ("jpg", "zip", "pdf", "gz")


# ---------------------------------------------------------------------------
# kernel semantics
# ---------------------------------------------------------------------------
def test_kernel_battery():
    for url, want in URL_BATTERY:
        assert url_extension(url) == want, url
    assert matches_ext("https://h/a/x.pdf", EXTS)
    assert matches_ext("https://h/a/X.PDF?v=2", EXTS)
    assert not matches_ext("https://h/a/x.pdf.txt", EXTS)   # last dot: txt
    assert not matches_ext("https://h/a/pdf", EXTS)         # no dot
    assert not matches_ext("https://h/a/.pdf", EXTS)        # dot-file
    # empty tuple (the default) never matches
    assert not matches_ext("https://h/a/x.pdf", ())


@pytest.mark.parametrize(
    "cfg",
    [
        CrawlConfig(exclude_extensions=EXTS),
        CrawlConfig(exclude_extensions=("mp3",)),
        CrawlConfig(),  # empty → never denied
    ],
)
def test_expr_matches_kernel_on_battery(spark, cfg):
    df = spark.createDataFrame([(u,) for u, _ in URL_BATTERY], ["canon_url"])
    got = {
        r["canon_url"]: (r["e"], r["x"])
        for r in df.select(
            "canon_url",
            url_extension_expr(F.col("canon_url")).alias("e"),
            ext_expr(F.col("canon_url"), cfg).alias("x"),
        ).collect()
    }
    for u, want_ext in URL_BATTERY:
        assert got[u][0] == want_ext, f"extension expr/kernel disagree on {u!r}"
        assert got[u][1] == matches_ext(u, cfg.exclude_extensions), (
            f"deny expr/kernel disagree on {u!r}"
        )


# ---------------------------------------------------------------------------
# engine vs oracle with the gate enabled
# ---------------------------------------------------------------------------
# a hub whose children include one clean page and two denied-extension urls
# (the discovery-site drop: neither may ever enter the frontier)
EXT_HUB = (
    b"<html><body><p>hub words</p>"
    b'<a href="https://extg.example.org/article/1">ok</a>'
    b'<a href="https://extg.example.org/dl/big.ZIP">bin</a>'
    b'<a href="https://extg.example.org/img/photo.jpg">pic</a>'
    b"</body></html>"
)
LEAF = b"<html><body><p>leaf words</p></body></html>"

N_ROUNDS = 3


def _ext_bundle():
    fb = fixture_bundle(**TINY)

    def page(url, html):
        return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}

    pages = fb["pages"] + [
        page("https://h1.example.org/ext-hub", EXT_HUB),
        page("https://extg.example.org/article/1", LEAF),
        # store pages FOR the denied urls exist — exclusion must come from
        # the gate/discovery, not from store absence (canonicalization
        # preserves path case, so the store spelling matches the link's)
        page("https://extg.example.org/dl/big.ZIP", LEAF),
        page("https://extg.example.org/img/photo.jpg", LEAF),
    ]
    next_rank = max(s["seed_rank"] for s in fb["seeds"]) + 1
    seeds = fb["seeds"] + [
        {"url": "https://h1.example.org/ext-hub", "seed_rank": next_rank},
        # a denied-extension SEED: canonicalizes fine, enters the round-0
        # frontier, and must be dropped AT THE GATE (counted ext_excluded)
        {"url": "https://h1.example.org/brochure.pdf", "seed_rank": next_rank + 1},
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


def test_ext_gate_engine_vs_oracle(spark, tmp_path):
    fb = _ext_bundle()
    cfg = CrawlConfig(
        round_limit=500, num_buckets=16, bloom_bucket_capacity=256,
        exclude_extensions=("zip", "jpg", "pdf"),
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

    # the denied seed was dropped at the gate and counted exactly once
    assert sum(m["counters"]["ext_excluded"] for m in manifests) == 1
    assert "https://h1.example.org/brochure.pdf" not in emitted
    # the clean hub + its clean child were crawled
    assert "https://h1.example.org/ext-hub" in emitted
    assert "https://extg.example.org/article/1" in emitted
    # no denied url was ever scheduled, despite store pages existing
    assert not any(matches_ext(u, cfg.exclude_extensions) for u in emitted)
    # discovery-site drop: denied children never entered seen or any
    # frontier version (the trap gate's invariant, same shape)
    assert not any(matches_ext(u, cfg.exclude_extensions) for u in oc.seen)
    for r in range(1, N_ROUNDS + 1):
        fr = state.io.read(f"frontier/round={r}", schemas.FRONTIER)
        bad = [
            row["canon_url"]
            for row in fr.collect()
            if matches_ext(row["canon_url"], cfg.exclude_extensions)
        ]
        assert bad == [], f"denied-extension urls in frontier/round={r}"


def test_flag_off_crawls_them(spark, tmp_path):
    """Inertness, stated positively: with the default empty tuple the same
    bundle schedules the zip/jpg/pdf urls like any others, the counter key
    is absent from every manifest, and engine still matches oracle."""
    fb = _ext_bundle()
    cfg = CrawlConfig(round_limit=500, num_buckets=16, bloom_bucket_capacity=256)
    state, manifests, oc, results = _run_both(spark, tmp_path / "off", cfg, fb)
    emitted = []
    for r in range(N_ROUNDS):
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        assert "ext_excluded" not in manifests[r]["counters"]
        emitted += [
            row["canon_url"]
            for row in state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            ).collect()
        ]
    assert "https://h1.example.org/brochure.pdf" in emitted
    # the uppercase-spelled child is scheduled with its case preserved —
    # the gate's case-insensitivity is about MATCHING, not rewriting
    assert "https://extg.example.org/dl/big.ZIP" in emitted


def test_config_hash_extension():
    """Default-empty is hash-absent (pre-flag state dirs keep resuming);
    a non-empty deny list changes the hash like every semantic knob, and
    different lists hash differently."""
    base = CrawlConfig()
    on = CrawlConfig(exclude_extensions=("zip",))
    on2 = CrawlConfig(exclude_extensions=("zip", "jpg"))
    assert "exclude_extensions" not in base._hash_dict()
    assert on._hash_dict()["exclude_extensions"] == ("zip",)
    assert len({base.config_hash(), on.config_hash(), on2.config_hash()}) == 3


def test_unmatchable_entries_fail_loud():
    """Entries url_extension() can never produce are config BUGS, not
    no-ops: the matcher lowercases the URL side and only ever yields the
    final dot-segment, so 'PDF', '.pdf' (when built directly, skipping
    CLI normalization) and 'tar.gz' previously matched nothing with
    ext_excluded silently stuck at 0."""
    import pytest

    for bad in ("PDF", ".pdf", "tar.gz", "", "a/b"):
        with pytest.raises(ValueError, match="never match"):
            CrawlConfig(exclude_extensions=(bad,))
    # the normalized forms are accepted
    assert CrawlConfig(exclude_extensions=("pdf", "gz")).exclude_extensions


def test_cli_normalizes_and_refuses_multi_segment(tmp_path):
    """--exclude-ext '.PDF' normalizes to 'pdf'; 'tar.gz' is refused at
    argparse with a pointer to pass 'gz' (exit 2, no traceback)."""
    import pytest

    import jobs.run_rounds as cli

    assert cli._norm_exts.__doc__  # helper exists and is documented
    class _AP:
        def error(self, msg):
            raise SystemExit(2)

    assert cli._norm_exts(_AP(), [".PDF", "zip", "..", ""]) == ("pdf", "zip")
    with pytest.raises(SystemExit):
        cli._norm_exts(_AP(), ["tar.gz"])
