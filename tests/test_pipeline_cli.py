"""End-to-end CLI pipeline drill: ONE run_rounds.py invocation drives
crawl-state export plus the full derived-product chain
(normalize → scrub → redact → filter → dedup → sample → shards) and every
stage's manifest records its upstream — the complete "switch a training
pipeline onto this engine" path, exercised exactly as an operator would
type it."""

from __future__ import annotations

import json
import os

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO


def _manifest(path):
    with open(os.path.join(path, "_export_manifest.json")) as f:
        return json.load(f)


def test_full_chain_one_invocation(spark, tmp_path):
    state_dir = str(tmp_path / "crawl")
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, state_dir), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, 2)

    d = {
        name: str(tmp_path / name)
        for name in (
            "corpus", "norm", "scrub", "redact", "filt", "dedup", "sample",
            "shards",
        )
    }
    argv = [
        "--state-dir", state_dir,
        "--export", d["corpus"], "--export-annotate", "--export-split",
        "--export-normalize", d["norm"],
        "--export-scrub", d["scrub"], "--scrub-min-docs", "4",
        "--export-redact", d["redact"],
        "--export-filter", d["filt"], "--filter-min-words", "2",
        "--export-dedup", d["dedup"],
        "--export-sample", d["sample"], "--sample-rate", "0.9",
        "--export-shards", d["shards"], "--shard-tokens", "200",
    ]
    import jobs.run_rounds as cli

    # getOrCreate inside the CLI reuses the test session — no second JVM
    assert cli.main(argv) == 0

    # provenance chain: each stage consumed exactly the previous product
    assert _manifest(d["norm"])["normalized_from"] == d["corpus"]
    assert _manifest(d["scrub"])["scrubbed_from"] == d["norm"]
    assert _manifest(d["redact"])["redacted_from"] == d["scrub"]
    assert _manifest(d["filt"])["filtered_from"] == d["redact"]
    assert _manifest(d["dedup"])["deduped_from"] == d["filt"]
    assert _manifest(d["sample"])["sampled_from"] == d["dedup"]
    assert _manifest(d["shards"])["sharded_from"] == d["sample"]

    # row-count monotonicity where stages can only select
    rows = {k: _manifest(v)["rows"] for k, v in d.items()}
    assert rows["corpus"] == rows["norm"] == rows["scrub"] == rows["redact"]
    assert rows["filt"] <= rows["redact"]
    assert rows["dedup"] <= rows["filt"]
    assert rows["sample"] <= rows["dedup"]
    assert rows["shards"] == rows["sample"]
    assert rows["shards"] > 0

    # the terminal product really is shard-partitioned, schema intact, and
    # carries the annotation + split columns from the head of the chain
    shard_dirs = [
        x for x in os.listdir(d["shards"]) if x.startswith("shard_id=")
    ]
    assert shard_dirs
    final = spark.read.option("basePath", d["shards"]).parquet(
        *(os.path.join(d["shards"], x) for x in shard_dirs)
    )
    assert {"canon_url", "text", "text_sha", "split", "shard_id"} <= set(
        final.columns
    )
    assert final.count() == rows["shards"]
