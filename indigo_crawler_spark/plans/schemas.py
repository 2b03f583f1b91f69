"""Explicit StructTypes for every engine table (SURVEY.md §1.2 —
never schema-inferred in production paths)."""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

SEEDS = StructType(
    [
        StructField("url", StringType()),
        StructField("seed_rank", IntegerType()),
    ]
)

ROBOTS = StructType(
    [
        StructField("host", StringType()),
        StructField("host_hash", LongType()),
        StructField("robots_txt", StringType()),
        StructField("fetched_ts", TimestampType()),
    ]
)

HOST_BUDGETS = StructType(
    [
        StructField("host", StringType()),
        StructField("host_hash", LongType()),
        StructField("budget", IntegerType()),
        StructField("backoff_until_round", IntegerType()),
    ]
)

FRONTIER = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("host_hash", LongType()),
        StructField("pk", IntegerType()),
        StructField("depth", IntegerType()),
        StructField("seed_rank", IntegerType()),  # null for discovered URLs
        StructField("priority", DoubleType()),
        StructField("discovered_round", IntegerType()),
    ]
)

SEEN = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("url_hash", BinaryType()),
        StructField("pk", IntegerType()),
        StructField("first_round", IntegerType()),
    ]
)

FETCH_BATCHES = StructType(
    [
        StructField("round", IntegerType()),
        StructField("batch_id", IntegerType()),
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("host_hash", LongType()),
        StructField("priority", DoubleType()),
        StructField("rank_in_host", IntegerType()),
        StructField("global_rank", IntegerType()),
        StructField("status", StringType()),  # synthetic fetch outcome (EP3)
    ]
)

FETCHED_TEXT = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("text", StringType()),
    ]
)

# fetched_text as written under cfg.meta_robots_enabled: the page's REP
# noindex flag rides the table so the corpus export can honor it. Reading a
# pre-flag round with this schema yields noindex = NULL (treated as False).
FETCHED_TEXT_ROBOTS = StructType(
    FETCHED_TEXT.fields + [StructField("noindex", BooleanType())]
)

PAGE_STORE = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("host", StringType()),
        StructField("pk", IntegerType()),
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("lang", StringType()),
    ]
)

HOST_COUNTS = StructType(
    [
        StructField("host", StringType()),
        StructField("host_count", LongType()),
    ]
)

# static skew dimension: hosts worth salting (derived once at bootstrap)
HEAVY_HOSTS = StructType([StructField("host", StringType())])

# per-round scheduling telemetry: rollup(host, status) counts (A7)
ROUND_METRICS = StructType(
    [
        StructField("host", StringType()),    # null = rolled up
        StructField("status", StringType()),  # null = rolled up
        StructField("n", LongType()),
    ]
)

# retired URLs (re-crawlable): subtracted from the seen membership.
# retired_after_round bounds the subtraction — only seen rows with
# first_round <= retired_after_round vanish, so a later RE-crawl of the same
# url (a new seen row with a later first_round) counts as seen again.
RETIRED = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("url_hash", BinaryType()),
        StructField("pk", IntegerType()),
        StructField("retired_after_round", IntegerType()),
    ]
)

SEEN_BLOOM = StructType(
    [
        StructField("pk", IntegerType()),
        StructField("nbits", LongType()),
        StructField("k", IntegerType()),
        StructField("bits", BinaryType()),
    ]
)

# link-graph edges extracted this round: src = fetched canon_url, dst = a
# canonicalized out-link (extraction facts — recorded before the depth cap
# and trap gate, which govern frontier ADMISSION, not the graph)
LINKS = StructType(
    [
        StructField("src", StringType()),
        StructField("dst", StringType()),
    ]
)

# per-host lifetime emitted-url totals (SEMANTICS.md §Host page cap):
# versioned like host_budgets — ``host_emitted/round=R`` holds the counts
# ENTERING round R; the gate clips budgets to the remaining headroom and
# drops hosts at the cap permanently
HOST_EMITTED = StructType(
    [
        StructField("host", StringType()),
        StructField("emitted_total", LongType()),
    ]
)

# adaptive-recrawl freshness state (SEMANTICS.md §Adaptive recrawl): one row
# per url FETCHED at ``fetched_round`` with the sha256 hex digest of its
# extracted text and the revisit interval derived from the digest-compare
# against the url's previous fetch (unchanged → doubled, changed → reset).
# Written per round as ``revisit/round=R`` deltas; latest row per url wins
# (CrawlState.revisit_through), compacted at the seen cadence.
REVISIT = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("pk", IntegerType()),
        StructField("fetched_round", IntegerType()),
        StructField("interval", IntegerType()),
        StructField("digest", StringType()),
    ]
)

# transient-failure retry state (SEMANTICS.md §Transient failures): one row
# per url that FAILED (transiently) at some round and is still retryable,
# carrying its lifetime failure count. Written per round as
# ``retries/round=R`` deltas holding ONLY that round's failed-and-retained
# urls; ``fails`` is monotone per url (a url leaves the frontier — success
# or exhaustion — before its row could ever regress), so the latest row per
# url is simply max(fails) (CrawlState.retries_through).
RETRIES = StructType(
    [
        StructField("canon_url", StringType()),
        StructField("fails", IntegerType()),
        StructField("pk", IntegerType()),
    ]
)

# mid-crawl robots updates (SEMANTICS.md §Robots updates): per-host
# robots.txt replacements queued between rounds as ``robots_delta/round=R``
# side tables (R = the first round they gate). ``upd_round`` orders
# replacements — the gate reads the MAX-upd_round row per host over static
# (upd_round = -1) ∪ deltas ≤ R (CrawlState.robots_through /
# operators/inject.fold_robots_latest).
ROBOTS_DELTA = StructType(
    [
        StructField("host", StringType()),
        StructField("host_hash", LongType()),
        StructField("robots_txt", StringType()),
        StructField("upd_round", IntegerType()),
    ]
)

# fixed-point PageRank over the accumulated link graph at a tick round
# (kernels/pagerank.py is normative; rank_int is rank · PR_SCALE floored)
PAGERANK = StructType(
    [
        StructField("node", StringType()),
        StructField("rank_int", LongType()),
    ]
)
