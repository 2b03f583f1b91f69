"""Mirror-host detection (SEMANTICS.md §Mirror hosts) — host pairs serving
near-identical content, exact and content-addressed:

- operator unit semantics: containment against the smaller host, integer
  cross-multiplied threshold, min_shared floor, deterministic host_a <
  host_b spelling, duplicate rows carry no weight;
- hot-sha guard: a sha on more hosts than the cap mines NO pairs but still
  counts in per-host totals (boilerplate lowers overlap, never fabricates
  it);
- export product end-to-end: a crawl whose fixture serves byte-identical
  pages under two hosts yields exactly that pair from mirror_report over
  the exported corpus, with the manifest recording the knobs.
"""

from __future__ import annotations

from datetime import datetime, timezone

from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.operators.mirrors import mirror_pairs
from indigo_crawler_spark.plans.export import (
    _read_export_manifest,
    export_corpus,
    mirror_report,
)
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO

_TS = datetime(2023, 12, 31, tzinfo=timezone.utc)


def _pairs(df):
    return {
        (r["host_a"], r["host_b"]): (r["shared"], r["docs_a"], r["docs_b"])
        for r in df.collect()
    }


def _frame(spark, rows):
    return spark.createDataFrame(rows, "host string, text_sha string")


def test_pair_semantics(spark):
    rows = (
        # a and b: full mirrors over 3 shas
        [("a", f"s{i}") for i in range(3)]
        + [("b", f"s{i}") for i in range(3)]
        # c: contains a's 3 shas plus 7 of its own — containment flags (a,c)
        + [("c", f"s{i}") for i in range(3)]
        + [("c", f"x{i}") for i in range(7)]
        # d: one shared sha only — under min_shared
        + [("d", "s0"), ("d", "y0"), ("d", "y1")]
        # duplicates carry no extra weight
        + [("a", "s0"), ("a", "s0")]
    )
    got = _pairs(mirror_pairs(_frame(spark, rows), min_overlap_pct=80, min_shared=2))
    assert got[("a", "b")] == (3, 3, 3)
    assert got[("a", "c")] == (3, 3, 10)   # 3*100 >= 80*min(3,10)
    assert got[("b", "c")] == (3, 3, 10)
    # d shares only s0 with each: shared=1 < min_shared, and 1*100 < 80*3
    assert not any("d" in p for p in got)
    # threshold bites: 2 of 3 shared is 66% < 80%
    rows2 = [("e", f"s{i}") for i in range(3)] + [
        ("f", "s0"), ("f", "s1"), ("f", "z0")
    ]
    assert _pairs(mirror_pairs(_frame(spark, rows2))) == {}
    # ...but passes at a 60% bar
    got2 = _pairs(mirror_pairs(_frame(spark, rows2), min_overlap_pct=60))
    assert got2 == {("e", "f"): (2, 3, 3)}


def test_hot_sha_guard(spark):
    # one sha on 4 hosts with the cap at 3: it mines no pairs, but still
    # counts in totals — g/h share 2 REAL shas of their 3 docs each, and
    # the boilerplate sha drags their overlap to 2/3 < 80%
    rows = (
        [(h, "boiler") for h in ("g", "h", "i", "j")]
        + [("g", "r0"), ("g", "r1"), ("h", "r0"), ("h", "r1")]
    )
    got = _pairs(
        mirror_pairs(_frame(spark, rows), min_overlap_pct=80, max_hosts_per_sha=3)
    )
    assert got == {}
    # at 60% the real overlap (2 of 3) passes — and shared counts ONLY the
    # minable shas, totals count everything
    got2 = _pairs(
        mirror_pairs(
            _frame(spark, rows), min_overlap_pct=60, max_hosts_per_sha=3
        )
    )
    assert got2 == {("g", "h"): (2, 3, 3)}
    # with the cap lifted the boilerplate mines too: i/j become a pair of
    # 1-doc hosts sharing their whole (1-sha) content
    got3 = _pairs(
        mirror_pairs(_frame(spark, rows), min_overlap_pct=80, min_shared=1)
    )
    assert got3[("i", "j")] == (1, 1, 1)


def _page(url, words):
    html = f"<html><body><p>{words}</p></body></html>".encode()
    return {"url": url, "warc_ts": _TS, "html": html, "text": None, "lang": "en"}


def test_mirror_report_end_to_end(spark, tmp_path):
    """Two hosts serving byte-identical pages → exported corpus →
    mirror_report finds exactly that pair; the distinct-content host pairs
    with nobody."""
    pages, seeds = [], []
    rank = 1
    for i in range(3):
        for h in ("mh-a.example.org", "mh-b.example.org"):
            url = f"https://{h}/p{i}"
            pages.append(_page(url, f"mirrored words {i}"))
            seeds.append({"url": url, "seed_rank": rank})
            rank += 1
    for i in range(3):
        url = f"https://mh-c.example.org/p{i}"
        pages.append(_page(url, f"unique words {i} on c"))
        seeds.append({"url": url, "seed_rank": rank})
        rank += 1

    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "crawl")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, pages),
        seeds_df(spark, seeds),
        robots_df(spark, []),
        budgets_df(spark, []),
        state,
    )
    run_rounds(spark, state, 2)
    corpus = str(tmp_path / "corpus")
    export_corpus(state, corpus)

    out = str(tmp_path / "mirrors")
    report = mirror_report(spark, corpus, out)
    assert report == {"pairs": 1, "hosts": 2, "out_path": out}
    got = _pairs(spark.read.parquet(out + "/pairs"))
    assert got == {("mh-a.example.org", "mh-b.example.org"): (3, 3, 3)}
    m = _read_export_manifest(out)
    assert m["rows"] == 1 and m["mirror_hosts"] == 2
    assert m["knobs"] == {
        "min_overlap_pct": 80, "min_shared": 2, "max_hosts_per_sha": 50
    }
