"""Structured-Streaming skin over the batch round (SURVEY.md §2.10).

The engine is *batch rounds* by spec (BASELINE.json:6); this skin exists so
a stream of page-discovery events can drive the SAME round function without
reinventing semantics: ``foreachBatch`` treats every micro-batch of newly
discovered pages as an appended slice of the page store, then advances one
scheduler round. State (frontier/seen/blooms) lives in the CrawlState dir
exactly as in batch mode, so batch and streaming runs are interchangeable
and resume from the same manifests.

Late data: bound by ``withWatermark("warc_ts", ...)`` before the sink; rows
older than the watermark are dropped by Spark before reaching the round.
No streaming joins or session windows are needed (SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.plans.round import CrawlState, last_complete_round, run_round


def stream_rounds(
    pages_stream: DataFrame,
    state: CrawlState,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """Attach the batch round to a streaming source of pages.

    Returns the StreamingQuery. Each micro-batch: append new pages into the
    page store (same canonicalize+dedup discipline via bootstrap-equivalent
    upsert is intentionally NOT done here — the store is append-only per
    micro-batch and dedup happens at fetch via min_by), then run one round.
    """

    def advance(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(state.io.path("page_store_stream"))
        done = last_complete_round(state)
        next_round = 0 if done is None else done + 1
        run_round(spark, state, next_round, with_counters=False)

    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .writeStream.foreachBatch(advance)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
