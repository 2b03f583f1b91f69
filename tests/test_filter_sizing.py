"""A4 capacity auto-sized from A3 (VERDICT r3 missing #2): with no config
override, bootstrap derives the membership-filter bucket capacity from the
approx_count_distinct estimate riding the store write (4x headroom, floor
4096), persists it in the bootstrap manifest, and every round reads the
COMMITTED figure — geometry must be identical across rounds and resumes
because bitmap merges are pure bitwise OR. A config override wins outright.
"""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans.round import CrawlState, bootstrap
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO


def _bootstrap(spark, root, cfg):
    fb = fixture_bundle(**TINY)
    st = CrawlState(io=TableIO(spark, root), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        st,
    )
    return st


def test_auto_sized_capacity_derived_and_persisted(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16)  # capacity None = auto
    st = _bootstrap(spark, str(tmp_path / "auto"), cfg)
    m = st.io.read_manifest("bootstrap")
    est = m["distinct_urls_est"]
    assert est > 0
    want = max(4 * est // 16, 4096)
    assert m["bloom_bucket_capacity"] == want
    assert st.filter_capacity() == want
    # a fresh state over the same committed dir resolves the SAME geometry
    # (what a resumed run does) — never re-estimates
    again = CrawlState(io=TableIO(spark, str(tmp_path / "auto")), cfg=cfg)
    assert again.filter_capacity() == want


def test_config_override_wins(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=32)
    st = _bootstrap(spark, str(tmp_path / "pin"), cfg)
    assert st.io.read_manifest("bootstrap")["bloom_bucket_capacity"] == 32
    assert st.filter_capacity() == 32


def test_cuckoo_headroom_doubled():
    """The cuckoo derivation doubles the headroom (8x vs bloom's 4x): cuckoo
    overflow is a hard mid-crawl failure with per-crawl-frozen geometry,
    while bloom overflow only raises FPR against the exact backstop
    (ADVICE r4: discovered URLs beyond the corpus estimate accumulate in
    the seen set)."""
    from indigo_crawler_spark.plans.round import derived_filter_capacity

    bloom = CrawlConfig(num_buckets=16)
    cuckoo = CrawlConfig(num_buckets=16, filter_kind="cuckoo")
    est = 100_000
    assert derived_filter_capacity(est, bloom) == 4 * est // 16
    assert derived_filter_capacity(est, cuckoo) == 8 * est // 16
    # the floor still wins for tiny crawls, either kind
    assert derived_filter_capacity(10, bloom) == 4096
    assert derived_filter_capacity(10, cuckoo) == 4096


def test_legacy_manifest_falls_back(spark, tmp_path):
    # a state dir bootstrapped before the manifest carried the field must
    # keep the old default rather than crash or silently resize
    cfg = CrawlConfig(round_limit=50, num_buckets=16)
    st = CrawlState(io=TableIO(spark, str(tmp_path / "old")), cfg=cfg)
    st.io.write_manifest("bootstrap", {"n_heavy_hosts": 0})
    assert st.filter_capacity() == 1_000_000
