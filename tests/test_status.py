"""crawl_status (plans/status.py): the zero-job state-dir summary agrees
with the commit records it is derived from."""

from __future__ import annotations

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.plans.state_gc import gc_state
from indigo_crawler_spark.plans.status import crawl_status
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO

N = 3


def test_status_matches_manifests(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "crawl")), cfg=cfg)

    # pre-bootstrap: empty dir is a valid answer, not an error
    empty = crawl_status(state)
    assert empty["rounds_committed"] == 0 and empty["resume_anchor"] is None

    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    manifests = run_rounds(spark, state, N)

    st = crawl_status(state)
    assert st["rounds_committed"] == N and st["resume_anchor"] == N - 1
    assert st["bootstrap"]["bloom_bucket_capacity"] == 64
    assert st["totals"]["emitted"] == sum(
        m["counters"]["emitted"] for m in manifests
    )
    assert st["totals"]["fetched_pages"] == sum(
        m["counters"]["fetched_pages"] for m in manifests
    )
    assert st["urls_seen"] == sum(m["digests"]["seen"]["rows"] for m in manifests)
    assert st["frontier_pending"] == manifests[-1]["digests"]["frontier_next"]["rows"]
    assert st["last_round_counters"] == manifests[-1]["counters"]
    assert st["storage_bytes"] > 0
    assert st["storage_by_family"]["page_store"] > 0
    assert "gc" not in st  # no GC has run

    before = st["storage_bytes"]
    gc_state(state)
    st2 = crawl_status(state)
    assert st2["gc"]["generation"] == 1 and st2["gc"]["tables_reclaimed"] > 0
    assert st2["storage_bytes"] < before
    # committed progress is untouched by GC
    assert st2["totals"] == st["totals"] and st2["urls_seen"] == st["urls_seen"]
