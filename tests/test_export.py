"""Corpus export (plans/export.py): per-round fetched_text deltas fold into
one latest-text-per-url table, oracle-exact, re-crawl-aware, gc-aware."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans.export import export_corpus
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.plans.state_gc import gc_state
from indigo_crawler_spark.operators.retire import retire_urls
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from oracle.simulator import OracleCrawl

N_BEFORE, N_TOTAL = 2, 6


def test_export_latest_text_per_url(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "crawl")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, N_BEFORE)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_BEFORE)

    # retire round 0's fetches so the link graph re-crawls some of them —
    # exactly the path that makes a url appear in TWO fetched_text rounds
    retired = [e["canon_url"] for e in results[0].emitted]
    retire_urls(state, spark.createDataFrame([(u,) for u in retired], "url string"))
    oc.retire(retired)
    run_rounds(spark, state, N_TOTAL)
    results += [oc.step(r) for r in range(N_BEFORE, N_TOTAL)]

    # oracle view of the export semantic: latest text per url, in round order
    want: dict[str, tuple[int, str]] = {}
    for r, res in enumerate(results):
        for url, text in res.texts.items():
            want[url] = (r, text)
    refetched = {u for u, (r, _) in want.items() if u in set(retired) and r >= N_BEFORE}
    assert refetched, "fixture must re-crawl at least one retired url"

    out = str(tmp_path / "corpus")
    report = export_corpus(state, out)
    assert report["rounds"] == list(range(N_TOTAL))
    got = {
        row["canon_url"]: (row["fetch_round"], row["text"])
        for row in spark.read.parquet(out).collect()
    }
    assert report["rows"] == len(got)  # one row per url, observe agrees
    assert got == want

    # pk partitioning matches the engine's bucketing (co-location contract)
    pks = {row["pk"] for row in spark.read.parquet(out).select("pk").collect()}
    assert pks <= set(range(cfg.num_buckets))

    # gc-dropped products make the corpus unassemblable — loud refusal
    gc_state(state, keep_outputs=False)
    with pytest.raises(RuntimeError, match="reclaimed"):
        export_corpus(state, str(tmp_path / "corpus2"))


def test_export_incremental_equals_full(spark, tmp_path):
    """E41: extending an existing export folds ONLY the new rounds and
    rewrites ONLY the pk buckets the delta touches — and the result is
    bit-equal (rows, fetch_rounds, partitioning) to a from-scratch full
    export of the same round range."""
    import os

    cfg = CrawlConfig(round_limit=50, num_buckets=64, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "crawl")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, N_BEFORE)
    inc = str(tmp_path / "corpus_inc")
    r0 = export_corpus(state, inc)
    assert r0["mode"] == "full" and r0["rounds"] == list(range(N_BEFORE))

    # snapshot each bucket dir's file listing so untouched buckets are
    # provably untouched (parquet part files carry unique names)
    listing_before = {
        d: sorted(os.listdir(os.path.join(inc, d)))
        for d in os.listdir(inc)
        if d.startswith("pk=")
    }

    # retire round 0's fetches so some urls re-crawl (supersession must hold
    # across the incremental boundary), then extend the crawl
    retired = [
        row["canon_url"]
        for row in state.io.read("fetch_batches/round=0", None).collect()
    ]
    retire_urls(state, spark.createDataFrame([(u,) for u in retired], "url string"))
    run_rounds(spark, state, N_TOTAL)

    r1 = export_corpus(state, inc)
    assert r1["mode"] == "incremental"
    assert r1["rounds"] == list(range(N_BEFORE, N_TOTAL))
    assert 0 < r1["pks_rewritten"] <= cfg.num_buckets

    full = str(tmp_path / "corpus_full")
    r2 = export_corpus(state, full)
    assert r2["mode"] == "full"

    def snap(path):
        return {
            row["canon_url"]: (row["fetch_round"], row["text"], row["host"], row["pk"])
            for row in spark.read.parquet(path).collect()
        }

    got_inc, got_full = snap(inc), snap(full)
    assert got_inc == got_full
    assert r1["rows"] == r2["rows"] == len(got_full)
    # at least one url superseded ACROSS the boundary: fetched in rounds
    # <N_BEFORE originally, latest row now from a later round
    assert any(
        u in set(retired) and fr >= N_BEFORE for u, (fr, *_rest) in got_inc.items()
    )

    # buckets the delta did not touch kept their exact files (no rewrite)
    listing_after = {
        d: sorted(os.listdir(os.path.join(inc, d)))
        for d in os.listdir(inc)
        if d.startswith("pk=")
    }
    untouched = [
        d
        for d in listing_before
        if d in listing_after and listing_before[d] == listing_after[d]
    ]
    rewritten = [d for d in listing_before if d not in untouched]
    assert len(rewritten) <= r1["pks_rewritten"]

    # re-export with nothing new: a no-op, nothing rewritten
    r3 = export_corpus(state, inc)
    assert r3["mode"] == "noop" and r3["pks_rewritten"] == 0
    assert r3["rows"] == r1["rows"]

    # gc-drop old products, crawl on: a fresh full export is impossible, but
    # the existing corpus still extends — the corpus carries its own history
    gc_state(state, keep_outputs=False)
    run_rounds(spark, state, N_TOTAL + 2)
    with pytest.raises(RuntimeError, match="reclaimed"):
        export_corpus(state, str(tmp_path / "corpus3"))
    r4 = export_corpus(state, inc)
    assert r4["mode"] == "incremental"
    assert r4["rounds"] == [N_TOTAL, N_TOTAL + 1]


def test_export_repair_half_swap(spark, tmp_path):
    """A crash between the two renames of a bucket swap leaves pk=N__old
    with no live dir; the next export run restores it before merging."""
    import os

    from indigo_crawler_spark.plans.export import _repair_swaps

    out = tmp_path / "corpus"
    (out / "pk=3").mkdir(parents=True)
    (out / "pk=3" / "part-0.parquet").write_bytes(b"x")
    # half-swapped: live renamed away, staged rename never happened
    os.rename(out / "pk=3", out / "pk=3__old")
    _repair_swaps(str(out))
    assert (out / "pk=3" / "part-0.parquet").exists()
    assert not (out / "pk=3__old").exists()
    # stale backup WITH a live dir is dropped, live wins
    (out / "pk=5").mkdir()
    (out / "pk=5__old").mkdir()
    _repair_swaps(str(out))
    assert (out / "pk=5").exists() and not (out / "pk=5__old").exists()


def test_export_annotated_and_dedup(spark, tmp_path):
    """E43: annotation columns are exact per-row functions of text (sha
    vs hashlib, word count vs Python split), an annotated incremental
    extend equals a fresh annotated full export, the annotated/plain
    choice cannot be flipped on an existing corpus, and the deduped
    derived product keeps exactly one row (min canon_url) per distinct
    text."""
    import hashlib

    from indigo_crawler_spark.plans.export import dedup_corpus

    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "crawl")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, N_BEFORE)
    inc = str(tmp_path / "corpus_annot")
    r0 = export_corpus(state, inc, annotate=True)
    assert r0["mode"] == "full"

    rows = spark.read.parquet(inc).collect()
    assert len(rows) == r0["rows"] > 0
    for row in rows:
        assert row["text_sha"] == hashlib.sha256(
            row["text"].encode("utf-8")
        ).hexdigest()
        assert row["n_words"] == (len(row["text"].split()) if row["text"].strip() else 0)
        assert row["n_chars"] == len(row["text"])
        assert row["langid"] in {"de", "en", "es", "fr", "und"}

    # plain extend of an annotated corpus (and vice versa) refused loudly
    with pytest.raises(RuntimeError, match="annotated"):
        export_corpus(state, inc, annotate=False)

    run_rounds(spark, state, N_BEFORE + 2)
    r1 = export_corpus(state, inc, annotate=True)
    assert r1["mode"] == "incremental"
    full = str(tmp_path / "corpus_full")
    r2 = export_corpus(state, full, annotate=True)

    def snap(path):
        return {
            row["canon_url"]: tuple(
                row[c]
                for c in (
                    "fetch_round", "text", "pk",
                    "text_sha", "n_chars", "n_words", "punct_ratio", "langid",
                )
            )
            for row in spark.read.parquet(path).collect()
        }

    assert snap(inc) == snap(full)

    # dedup derived product: one row per distinct text, keeper = min url
    dd = str(tmp_path / "corpus_dedup")
    rep = dedup_corpus(spark, inc, dd)
    got = spark.read.parquet(dd).collect()
    by_sha: dict[str, str] = {}
    want_keeper: dict[str, str] = {}
    for row in spark.read.parquet(inc).collect():
        k = row["text_sha"]
        if k not in want_keeper or row["canon_url"] < want_keeper[k]:
            want_keeper[k] = row["canon_url"]
    for row in got:
        by_sha[row["text_sha"]] = row["canon_url"]
    assert rep["rows_out"] == len(want_keeper) == len(got)
    assert rep["rows_in"] == r1["rows"]
    assert by_sha == want_keeper

    # a dedup dir is a derived product, not an extendable corpus
    with pytest.raises(RuntimeError, match="DEDUPED"):
        export_corpus(state, dd)


def test_dedup_collapses_duplicates(spark, tmp_path):
    """A corpus with actual duplicate texts collapses: min-url keeper per
    sha, spanning pk buckets (the cross-bucket decision the incremental
    export honestly refuses to make)."""
    from indigo_crawler_spark.plans.export import (
        _write_export_manifest,
        dedup_corpus,
    )

    rows = [
        ("https://a.example.org/1", "a.example.org", 0, "same text", 3),
        ("https://b.example.org/2", "b.example.org", 1, "same text", 7),
        ("https://c.example.org/3", "c.example.org", 0, "same text", 11),
        ("https://d.example.org/4", "d.example.org", 2, "other", 3),
        ("https://e.example.org/5", "e.example.org", 0, "other", 7),
    ]
    src = str(tmp_path / "corpus")
    df = spark.createDataFrame(
        rows, "canon_url string, host string, fetch_round int, text string, pk int"
    )
    df.repartition("pk").write.partitionBy("pk").parquet(src)
    _write_export_manifest(
        src, {"through_round": 1, "num_buckets": 16, "rows": len(rows)}
    )

    out = str(tmp_path / "dedup")
    rep = dedup_corpus(spark, src, out)
    assert (rep["rows_in"], rep["rows_out"]) == (5, 2)
    got = {
        row["text"]: row["canon_url"]
        for row in spark.read.parquet(out).collect()
    }
    assert got == {
        "same text": "https://a.example.org/1",
        "other": "https://d.example.org/4",
    }
