"""Per-host crawl report (SEMANTICS.md §Host report) — the operator's
dashboard table: how each host spent the crawl's budget, and the numbers
the tuning knobs take as input (``--max-pages-per-site`` from emit
volume, ``--fail-host-threshold`` from failure bursts, exclusion of
mirror spellings flagged by F84, thin-host demotion sanity from word
mass).

All-integer aggregation over two round-scale unions — per-host results
are exact and SQL-re-derivable, which is what makes the driver query an
exact oracle rather than rows-only. Scale shape: one hash agg over the
fetch_batches union (ids + a status string, never text), one over the
fetched_text union (text crosses exactly one token-count expr, then only
(host, count) rows move), one small full-outer join on the host
dimension. No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.functions.text_analysis import whitespace_token_count


def host_stats(batches: DataFrame, texts: DataFrame) -> DataFrame:
    """Per-host crawl totals (SEMANTICS.md §Host report — normative).

    *batches*: (host, status, round) rows — one per EMITTED url-attempt
    (the fetch_batches union). *texts*: (host, text) rows — one per
    FETCHED page delta (the fetched_text union; refetches count per
    fetch: the report measures spend, not corpus size). Output, one row
    per host appearing in either input:

    - ``emitted``: url-attempts scheduled (politeness slots spent);
    - ``banned`` / ``failed``: EP3 ban outcomes and transient failures;
    - ``first_round`` / ``last_round``: the host's activity span;
    - ``pages``: fetched page deltas (text-yielding fetches);
    - ``words``: whitespace tokens across those pages (the thin-host
      signal at report granularity).

    Hosts emitted but never fetched (all failed/banned-without-text)
    carry pages = words = 0; the reverse cannot occur (every text row
    rode an emitted url), but the full-outer keeps the fold total."""
    b = batches.groupBy("host").agg(
        F.count("*").cast("long").alias("emitted"),
        F.sum((F.col("status") == "banned").cast("long")).alias("banned"),
        F.sum((F.col("status") == "failed").cast("long")).alias("failed"),
        F.min("round").cast("int").alias("first_round"),
        F.max("round").cast("int").alias("last_round"),
    )
    t = texts.select(
        "host", whitespace_token_count(F.col("text")).alias("_w")
    ).groupBy("host").agg(
        F.count("*").cast("long").alias("pages"),
        F.coalesce(F.sum("_w"), F.lit(0)).cast("long").alias("words"),
    )
    return b.join(t, on="host", how="full_outer").select(
        "host",
        F.coalesce(F.col("emitted"), F.lit(0)).cast("long").alias("emitted"),
        F.coalesce(F.col("banned"), F.lit(0)).cast("long").alias("banned"),
        F.coalesce(F.col("failed"), F.lit(0)).cast("long").alias("failed"),
        F.col("first_round").cast("int").alias("first_round"),
        F.col("last_round").cast("int").alias("last_round"),
        F.coalesce(F.col("pages"), F.lit(0)).cast("long").alias("pages"),
        F.coalesce(F.col("words"), F.lit(0)).cast("long").alias("words"),
    )
