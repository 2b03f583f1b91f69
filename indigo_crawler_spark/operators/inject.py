"""Mid-crawl seed injection — the operational dual of ``operators/retire``.

A months-long crawl discovers new verticals from outside the link graph
(fresh sitemaps, partner feeds, operator triage); those URLs must enter the
frontier of the NEXT round without recomputing anything already committed.
``inject_seeds`` appends them to a side table ``injected/round=R`` (R = the
next round to run) that ``CrawlState.frontier(R)`` unions with the pinned
``frontier/round=R`` file at read time:

  * the committed frontier file — whose lineage digest round R-1's manifest
    pins — is NEVER mutated, so the resume-anchor verify and ``fsck`` keep
    passing byte-for-byte;
  * round R consumes the union exactly once: its frontier-advance writes
    un-emitted injected rows into ``frontier/round=R+1`` like any other
    candidate, so rounds > R never re-read the side table (GC reclaims it
    once round R commits, same rule as consumed frontiers);
  * replaying round R after a crash re-reads the same committed side table
    — injection happens between rounds and the table is rewritten
    atomically, so resume stays bit-exact.

Gating at inject time (mirrored in ``oracle.simulator.OracleCrawl.inject``):
junk URLs are dropped by canonicalization, duplicates keep the minimum
seed_rank, already-seen URLs are skipped (a retire → inject sequence DOES
re-crawl, matching the reference's re-queue semantics), and URLs already
pending in round R's frontier (committed or previously injected) are
skipped — the existing row wins, exactly like discovery's "existing
frontier rows win" rule.

Injected rows are seeds: depth 0, caller-supplied ``seed_rank`` (uniform
default 0 — per-url ranks ride an optional ``seed_rank`` input column), and
priority from the SAME formula as bootstrap, with host_count from the
bootstrap-frozen ``host_counts`` dimension (an unknown host counts 0 — the
identical convention the streaming skin and discovery use).

Scale shape: injection batches are tiny next to the frontier, but nothing
here assumes that — the seen check is the same SHUFFLE_HASH anti-join
``seen_through`` already pays, the pending check anti-joins one frontier
version, and the host_counts join is per-host scale. No collects, no
windows; one count action plus one atomic table rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.functions.keys import host_expr, host_hash_expr, pk_expr
from indigo_crawler_spark.functions.scoring import priority_expr
from indigo_crawler_spark.functions.udfs import make_canonicalize_udf
from indigo_crawler_spark.operators.dedup import dedup_min_by
from indigo_crawler_spark.plans import schemas


def inject_seeds(state, urls: DataFrame, seed_rank: int = 0) -> int:
    """Queue *urls* (column ``url``, optional per-url ``seed_rank``) for the
    next round's frontier; returns how many actually entered (junk,
    already-seen and already-pending URLs are skipped)."""
    from indigo_crawler_spark.plans.round import last_complete_round

    io, cfg = state.io, state.cfg
    done = last_complete_round(state)
    nxt = (done + 1) if done is not None else 0
    if not io.exists(f"frontier/round={nxt}"):
        raise RuntimeError(
            "no frontier to inject into — bootstrap the crawl first"
        )

    ranked = urls.select(
        make_canonicalize_udf(
            cfg.strip_tracking_enabled,
            cfg.collapse_www_enabled,
            cfg.sort_query_enabled,
            cfg.strip_session_enabled,
            cfg.prefer_https_enabled,
            cfg.collapse_index_enabled,
        )(F.col("url")).alias(
            "canon_url"
        ),
        (
            F.col("seed_rank").cast("int")
            if "seed_rank" in urls.columns
            else F.lit(int(seed_rank))
        ).alias("seed_rank"),
    ).where(F.col("canon_url").isNotNull())
    ranked = dedup_min_by(ranked, "canon_url", ["seed_rank"])

    pending = io.read(f"frontier/round={nxt}", schemas.FRONTIER)
    inj_table = f"injected/round={nxt}"
    if io.exists(inj_table):
        pending = pending.unionByName(io.read(inj_table, schemas.FRONTIER))

    live_seen = state.seen_through(nxt)
    hc = io.read("host_counts", schemas.HOST_COUNTS)
    fresh = (
        ranked.join(
            live_seen.select("canon_url").hint("SHUFFLE_HASH"),
            on="canon_url",
            how="left_anti",
        )
        .join(
            pending.select("canon_url").hint("SHUFFLE_HASH"),
            on="canon_url",
            how="left_anti",
        )
        .withColumn("host", host_expr("canon_url"))
        .join(hc.hint("SHUFFLE_HASH"), on="host", how="left")
        .withColumn("host_count", F.coalesce(F.col("host_count"), F.lit(0)))
        .select(
            "canon_url",
            "host",
            host_hash_expr(F.col("host")).alias("host_hash"),
            pk_expr(host_hash_expr(F.col("host")), cfg.num_buckets).alias("pk"),
            F.lit(0).alias("depth"),
            F.col("seed_rank").cast("int").alias("seed_rank"),
            priority_expr(
                F.lit(0), F.col("seed_rank"), F.col("host_count")
            ).alias("priority"),
            F.lit(nxt).cast("int").alias("discovered_round"),
        )
        .cache()
    )
    n = fresh.count()
    if not n:
        fresh.unpersist()
        return 0
    # same atomic commit discipline as retire: merge into a rewritten table
    # (temp dir + rename swap) — a raw append could tear under a crash
    if io.exists(inj_table):
        io.rewrite(
            io.read(inj_table, schemas.FRONTIER).unionByName(fresh), inj_table
        )
    else:
        io.write(fresh, inj_table)
    fresh.unpersist()
    return n
