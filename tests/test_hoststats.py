"""Per-host crawl report (SEMANTICS.md §Host report) — the derived
product ≡ totals independently folded from the oracle's per-round
results, over a crawl exercising bans AND transient failures:

- every column exact per host: emitted / banned / failed, activity span,
  fetched page deltas, whitespace-token mass (shared kernel);
- refetches count per fetch (spend, not corpus size) — guaranteed here
  by an age-based recrawl tick inside the window;
- --export-through slices the report to a prefix of rounds;
- the CLI verb writes the product standalone (no --rounds, no --export)
  with a kind-tagged manifest.
"""

from __future__ import annotations

import json
import os

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.tokens import whitespace_token_count_py
from indigo_crawler_spark.plans.export import host_report
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from oracle.simulator import OracleCrawl, _host_of

N_ROUNDS = 5


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    cfg = CrawlConfig(
        round_limit=50, num_buckets=16, bloom_bucket_capacity=64,
        ban_every=5, fail_every=3, max_retries=1, recrawl_after=2,
    )
    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path_factory.mktemp("hstats"))), cfg=cfg
    )
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)
    return state, results


def _expected(results, through):
    want: dict[str, dict] = {}
    for r in range(through + 1):
        for e in results[r].emitted:
            h = e["host"]
            w = want.setdefault(
                h,
                {
                    "emitted": 0, "banned": 0, "failed": 0,
                    "first_round": r, "last_round": r,
                    "pages": 0, "words": 0,
                },
            )
            w["emitted"] += 1
            w["banned"] += e["status"] == "banned"
            w["failed"] += e["status"] == "failed"
            w["last_round"] = max(w["last_round"], r)
        for u, text in results[r].texts.items():
            w = want[_host_of(u)]
            w["pages"] += 1
            w["words"] += whitespace_token_count_py(text)
    return want


def _report_rows(spark, out):
    return {
        row["host"]: row.asDict()
        for row in spark.read.parquet(os.path.join(out, "hosts")).collect()
    }


def test_report_matches_oracle_fold(spark, crawl, tmp_path_factory):
    state, results = crawl
    out = str(tmp_path_factory.mktemp("rep"))
    rep = host_report(state, out)
    got = _report_rows(spark, out)
    want = _expected(results, N_ROUNDS - 1)
    assert rep["hosts"] == len(want)
    assert set(got) == set(want)
    for h, w in want.items():
        g = {k: got[h][k] for k in w}
        assert g == w, f"host {h}"
    # the fixture actually exercised every column
    assert sum(w["banned"] for w in want.values()) > 0
    assert sum(w["failed"] for w in want.values()) > 0
    # refetches counted per fetch: recrawl_after=2 inside 5 rounds means
    # total pages exceed distinct fetched urls
    n_pages = sum(w["pages"] for w in want.values())
    distinct = len({u for r in results for u in r.texts})
    assert n_pages > distinct


def test_through_round_slices(spark, crawl, tmp_path_factory):
    state, results = crawl
    out = str(tmp_path_factory.mktemp("rep2"))
    host_report(state, out, through_round=1)
    got = _report_rows(spark, out)
    want = _expected(results, 1)
    assert set(got) == set(want)
    for h, w in want.items():
        assert {k: got[h][k] for k in w} == w, f"host {h}"
    with open(os.path.join(out, "_export_manifest.json")) as f:
        m = json.load(f)
    assert m["kind"] == "host_report" and m["through_round"] == 1


def test_cli_standalone(spark, crawl, tmp_path_factory):
    state, _ = crawl
    out = str(tmp_path_factory.mktemp("rep3"))
    import jobs.run_rounds as cli

    assert (
        cli.main(
            ["--state-dir", state.io.root, "--export-hoststats", out]
        )
        == 0
    )
    with open(os.path.join(out, "_export_manifest.json")) as f:
        assert json.load(f)["kind"] == "host_report"


def test_refuses_reclaimed_and_missing_rounds(spark, tmp_path):
    """host_report fails LOUD instead of reporting emitted=0 when a
    committed round's fetch_batches table is gone: gc --gc-drop-outputs
    rounds refuse by the gc manifest; a table missing WITHOUT a manifest
    record (crash mid gc-drop before the manifest write) refuses as
    corrupt state."""
    import shutil

    from indigo_crawler_spark.plans.state_gc import gc_state

    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, 2)

    # crash-mid-gc shape first (no manifest record): delete one round's dir
    gone = os.path.join(str(tmp_path), "fetch_batches", "round=0")
    keep = gone + ".bak"
    os.rename(gone, keep)
    with pytest.raises(RuntimeError, match="corrupt"):
        host_report(state, str(tmp_path / "rep_corrupt"))
    os.rename(keep, gone)

    # sanity: intact state reports fine
    assert host_report(state, str(tmp_path / "rep_ok"))["hosts"] > 0

    # gc-reclaimed shape: drop outputs, manifest names the rounds
    gc_state(state, keep_outputs=False)
    with pytest.raises(RuntimeError, match="reclaimed"):
        host_report(state, str(tmp_path / "rep_reclaimed"))
    shutil.rmtree(str(tmp_path / "rep_reclaimed"), ignore_errors=True)
