"""T1 — streaming skin (foreachBatch reusing the batch round) + observe counters."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, last_complete_round
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO


def test_observed_write_single_pass(spark, tmp_path):
    from indigo_crawler_spark.operators.observe import observed_write

    df = spark.range(100).withColumn("v", F.col("id") % 5)
    got = observed_write(
        df,
        lambda d: d.write.mode("overwrite").parquet(str(tmp_path / "t")),
        {"rows": F.count(F.lit(1)), "sum_v": F.sum("v")},
    )
    assert got == {"rows": 100, "sum_v": 200}
    assert spark.read.parquet(str(tmp_path / "t")).count() == 100


def test_streaming_skin_advances_rounds(spark, tmp_path):
    """A memory-rate stream of (empty) page batches drives real rounds via
    foreachBatch — the batch state dir advances exactly as in batch mode."""
    from indigo_crawler_spark.streaming.skin import stream_rounds

    fb = fixture_bundle(**TINY)
    state = CrawlState(
        io=TableIO(spark, str(tmp_path / "crawl")),
        cfg=CrawlConfig(round_limit=50, num_buckets=16),
    )
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    # rate source → shape into the pages schema (html null ⇒ no new stores)
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.concat(F.lit("https://x.example/"), F.col("value").cast("string")).alias("url"),
            F.col("timestamp").alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )
    q = stream_rounds(stream, state, str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 60
        while time.time() < deadline and (last_complete_round(state) or -1) < 1:
            time.sleep(1)
    finally:
        q.stop()
    done = last_complete_round(state)
    assert done is not None and done >= 1  # ≥2 rounds committed by the stream
    fb0 = state.io.read("fetch_batches/round=0", schemas.FETCH_BATCHES)
    assert fb0.count() > 0
