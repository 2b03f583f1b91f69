"""Recrawl policy — age-based refresh, composing retire + inject.

SEMANTICS.md §Recrawl (build round 5, default OFF): with
``cfg.recrawl_after = A > 0``, the URLs emitted at round ``R - A`` are
re-opened immediately before round R runs — first retired from the seen
set (operators/retire.py), then injected into round R's frontier as
refresh seeds (operators/inject.py) with the pinned ``RECRAWL_SEED_RANK``,
chosen so a refresh never outranks a real seed or a fresh discovery of
equal depth (its seed-rank priority term is ~1e-6).

The policy is deliberately a composition of the two existing external
mutations, so it inherits their replay story: a crash between the tick and
round R's manifest re-runs the tick on resume, where retire is a no-op
(the URLs are no longer seen) and inject skips already-pending rows — the
side table converges to the same bytes and round R replays bit-exactly.
A committed round R is never re-ticked (run_rounds skips its whole body),
so resumed crawls and straight-through crawls see identical state.

Scale shape: one emitted-slice read (bounded by round_limit K, pk-pruned),
one retired-table rewrite, one injected-side-table write per round — all
K-scale, never frontier-scale.

The CHANGE-RATE-ADAPTIVE variant (``cfg.recrawl_adaptive``, SEMANTICS.md
§Adaptive recrawl) replaces the fixed-age source with a per-url freshness
schedule: every fetched page's extracted-text sha256 is recorded in a
versioned ``revisit`` state (plans/round.py writes the per-round delta;
``CrawlState.revisit_through`` reads latest-per-url), a refetch with an
UNCHANGED digest doubles the url's interval, a CHANGED one resets it to
``recrawl_after``, and ``adaptive_tick`` re-opens whatever is due. Static
pages back off exponentially; moving pages are refreshed at the base age —
the freshness-scheduling behavior production crawlers converge on, spending
the refresh budget where content actually changes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from indigo_crawler_spark.functions.keys import (
    host_expr,
    host_hash_expr,
    pk_expr,
)
from indigo_crawler_spark.plans import schemas

# priority term 1/(1+rank) ≈ 1e-6: refreshes rank below any real seed and
# below nothing else (t2 is additive) — pinned here and mirrored verbatim
# by the oracle, not a config knob
RECRAWL_SEED_RANK = 1 << 20


# absolute overflow guard on the doubled interval (SEMANTICS.md §Adaptive
# recrawl): intervals live in int32 round arithmetic; capping the doubling
# at 2^30 keeps fetched_round + interval inside the type at any horizon.
# Mirrored verbatim by the oracle — not a config knob.
REVISIT_HARD_CAP = 1 << 30


def revisit_interval_expr(digest, prev_interval, prev_digest, a: int, max_interval: int):
    """The interval-derivation expression (SEMANTICS.md §Adaptive recrawl
    rule 2), shared by ``revisit_delta`` and the SQL-checked driver query:
    first fetch (NULL prev digest) → *a*; digest unchanged → previous
    interval doubled, hard-capped at 2^30 (int32 overflow guard); changed →
    reset to *a*; then ``min(·, max_interval)`` in every branch when the
    config cap is set. Long arithmetic inside so the doubling can't wrap
    before the cap bites; returns int."""
    interval = (
        F.when(prev_digest.isNull(), F.lit(int(a)).cast("long"))
        .when(
            prev_digest == digest,
            F.least(
                prev_interval.cast("long") * 2,
                F.lit(REVISIT_HARD_CAP).cast("long"),
            ),
        )
        .otherwise(F.lit(int(a)).cast("long"))
    )
    if max_interval:
        interval = F.least(interval, F.lit(int(max_interval)).cast("long"))
    return interval.cast("int")


def revisit_delta(state, extracted, round_no: int):
    """Freshness rows for the pages fetched at *round_no* (SEMANTICS.md
    §Adaptive recrawl): sha256 the extracted text, join the ≤K new digests
    against the url's PREVIOUS revisit row (latest per url over committed
    rounds < round_no), and derive the next interval — first fetch → A,
    digest unchanged → previous interval doubled (hard-capped 2^30, then
    cfg.recrawl_max_interval when set), digest changed → reset to A.

    Returns the REVISIT columns plus two transient flags the caller's
    Observation counts and drops (``_prev_seen``, ``_changed``) — zero
    extra jobs for the recrawl_unchanged/recrawl_changed counters.

    Scale shape: the new side is the round's ≤K fetched pages; the previous
    state is corpus-scale, so the join is SHUFFLE_HASH on the url key —
    the same single-pass cost class as the seen anti-join, and the one
    full-state read an adaptive round pays (the due tick's read is the
    other; both are O(1 snapshot + ≤cadence deltas) dir listings).
    """
    cfg = state.cfg
    a = int(cfg.recrawl_after)
    new = extracted.select(
        "canon_url",
        pk_expr(host_hash_expr(host_expr("canon_url")), cfg.num_buckets).alias(
            "pk"
        ),
        F.sha2(F.col("text"), 256).alias("digest"),
    )
    prev = state.revisit_through(round_no).select(
        "canon_url",
        F.col("interval").alias("_prev_interval"),
        F.col("digest").alias("_prev_digest"),
    )
    joined = new.join(prev.hint("SHUFFLE_HASH"), on="canon_url", how="left")
    interval = revisit_interval_expr(
        F.col("digest"),
        F.col("_prev_interval"),
        F.col("_prev_digest"),
        a,
        cfg.recrawl_max_interval,
    )
    return joined.select(
        "canon_url",
        "pk",
        F.lit(round_no).cast("int").alias("fetched_round"),
        interval.alias("interval"),
        "digest",
        F.col("_prev_digest").isNotNull().alias("_prev_seen"),
        (
            F.col("_prev_digest").isNotNull()
            & (F.col("_prev_digest") != F.col("digest"))
        ).alias("_changed"),
    )


def adaptive_tick(state, round_no: int) -> int:
    """Change-rate-adaptive refresh (SEMANTICS.md §Adaptive recrawl): re-open
    every url whose latest revisit row says it is DUE —
    fetched_round + interval <= round_no — via the same retire → inject
    composition as the fixed-age tick, so the replay story is inherited
    unchanged (retire no-ops on unseen urls, inject skips pending rows; a
    due url not emitted this round — budget caps, gates — simply stays due
    and converges through inject's skip). Returns how many entered the
    frontier."""
    cfg = state.cfg
    if not (cfg.recrawl_after and cfg.recrawl_adaptive):
        return 0
    if not state.has_revisit_state(round_no):
        return 0
    from indigo_crawler_spark.operators.inject import inject_seeds
    from indigo_crawler_spark.operators.retire import retire_urls

    due = (
        state.revisit_through(round_no)
        .where(F.col("fetched_round") + F.col("interval") <= F.lit(round_no))
        .select(F.col("canon_url").alias("url"))
    )
    retire_urls(state, due)
    return inject_seeds(state, due, seed_rank=RECRAWL_SEED_RANK)


def recrawl_tick(state, round_no: int) -> int:
    """Re-open the URLs emitted at ``round_no - cfg.recrawl_after`` so
    round ``round_no`` can re-fetch them; returns how many re-entered the
    frontier (0 when the policy is off or the source round predates the
    crawl)."""
    cfg = state.cfg
    if not cfg.recrawl_after:
        return 0
    src = round_no - cfg.recrawl_after
    if src < 0:
        return 0
    from indigo_crawler_spark.operators.inject import inject_seeds
    from indigo_crawler_spark.operators.retire import retire_urls

    urls = state.io.read(f"fetch_batches/round={src}", schemas.FETCH_BATCHES).select(
        F.col("canon_url").alias("url")
    )
    retire_urls(state, urls)
    return inject_seeds(state, urls, seed_rank=RECRAWL_SEED_RANK)
