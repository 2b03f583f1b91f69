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
