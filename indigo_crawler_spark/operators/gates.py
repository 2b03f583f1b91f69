"""J2/J3/P2 — robots gate + politeness budget/backoff attachment.

The Spark-native analogue of the reference's proxy validation: "may this
(host, fetcher) pair fetch now?" (BASELINE.json:6). Robots texts join on the
host key and are evaluated inside an Arrow-vectorized UDF; budgets/backoff
are a broadcast join (dimension-sized table — SURVEY.md J3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.functions.traps import (
    exclude_expr,
    ext_expr,
    host_deny_expr,
    trap_expr,
)
from indigo_crawler_spark.functions.udfs import (
    make_crawl_delay_udf,
    make_robots_allowed_udf,
)


# Process-level cache of the gate pass's round-invariant Column trees (r6,
# same discipline as plans/round._EXPR_CACHE): every tree below is a pure
# function of the frozen config — the robots/crawl-delay UDF applications,
# the trap/exclude/ext/allow-list predicates, the budget default — yet was
# rebuilt through dozens of py4j round-trips each round. Only the literals
# that vary per round (the backoff comparison against round_no) stay
# per-call. Keyed by the CrawlConfig instance value (frozen ⇒ hashable), so
# crawls with different configs never share trees.
_GATE_COLS: dict = {}


def _gate_cols(cfg: CrawlConfig) -> dict:
    c = _GATE_COLS.get(cfg)
    if c is None:
        c = {
            "trap": trap_expr(F.col("canon_url"), cfg),
            "excluded": exclude_expr(F.col("canon_url"), cfg),
            "ext": ext_expr(F.col("canon_url"), cfg),
            "hostdrop": host_deny_expr(F.col("host"), cfg),
            "budget0": F.coalesce(F.col("budget"), F.lit(cfg.default_budget)),
            "backoff0": F.coalesce(F.col("backoff_until_round"), F.lit(0)),
        }
        if cfg.robots_enabled:
            c["allowed"] = make_robots_allowed_udf(
                cfg.user_agent, cfg.robots_wildcards_enabled
            )(F.col("canon_url"), F.col("robots_txt"))
        if cfg.robots_enabled and cfg.round_seconds > 0:
            c["delay"] = make_crawl_delay_udf(cfg.user_agent)(
                F.col("robots_txt")
            )
            cap = F.greatest(
                F.lit(1),
                F.floor(
                    F.lit(float(cfg.round_seconds)) / F.col("_delay")
                ).cast("int"),
            )
            c["delay_budget"] = F.when(
                F.col("_delay").isNotNull() & (F.col("_delay") > 0),
                F.least(F.col("budget"), cap),
            ).otherwise(F.col("budget"))
        _GATE_COLS[cfg] = c
    return c


def host_cap_exprs(budget, emitted_total, cap: int):
    """Per-host lifetime emit cap (SEMANTICS.md §Host page cap), shared by
    ``gate_frontier`` and the SQL-checked driver query: a host whose
    lifetime emitted count has REACHED *cap* is capped (its rows leave the
    crawl permanently); an uncapped host's budget is clipped to its
    remaining headroom ``cap - emitted_total`` so the lifetime total can
    never overshoot. Returns ``(capped, clipped_budget)`` columns; a host
    with no totals row (NULL) has emitted 0."""
    total = F.coalesce(emitted_total, F.lit(0)).cast("long")
    capped = total >= F.lit(int(cap))
    clipped = F.least(
        budget.cast("long"), F.lit(int(cap)) - total
    ).cast("int")
    return capped, F.when(capped, F.lit(0)).otherwise(clipped)


def gate_frontier(
    frontier: DataFrame,
    robots: DataFrame,
    budgets: DataFrame,
    cfg: CrawlConfig,
    round_no: int,
    emitted_totals: DataFrame | None = None,
    small_host_dim: bool = False,
) -> DataFrame:
    """ONE gate pass: frontier + ``_allowed`` (robots) + ``budget`` +
    ``_backoff`` flags, as a single frame the round caches once.

    This replaces the old split_robots/attach_budget pair on the hot path:
    splitting into allowed/denied frames before caching made every consumer
    re-run the robots Arrow UDF over the full frontier (denied was evaluated
    a second time inside the frontier-advance job). Here the UDF runs exactly
    once per row per round; allowed/denied/eligible are cheap filters on the
    cached result.

    Extension gates (all default-off; SEMANTICS.md §Traps / §Exclude
    patterns / §Politeness): ``_trap`` flags structurally trappy URLs and
    ``_excluded`` flags operator deny-list matches (pure codegen exprs —
    both fold to ``lit(False)`` when disabled); with ``cfg.round_seconds``
    > 0 the budget
    column is additionally capped by the host's robots crawl-delay
    (max(1, floor(round_seconds / delay))) — evaluated inside the SAME
    joined pass so robots_txt still crosses into Python once per row.
    """
    honor_delay = cfg.robots_enabled and cfg.round_seconds > 0
    gc = _gate_cols(cfg)
    if cfg.robots_enabled:
        # robots is per-host (frontier-scale at web scale, not
        # dimension-scale): by default a broadcast build would serialize,
        # so SHUFFLE_HASH parallelizes it and never sorts the text blobs.
        # *small_host_dim* (r6): when the caller KNOWS the host dimension
        # is small (bootstrap manifest count — no per-round job), broadcast
        # it instead and skip shuffling the frontier by host entirely.
        robots_side = robots.select("host", "robots_txt")
        robots_side = (
            F.broadcast(robots_side)
            if small_host_dim
            else robots_side.hint("SHUFFLE_HASH")
        )
        df = frontier.join(
            robots_side,
            on="host",
            how="left",
        ).withColumn("_allowed", gc["allowed"])
        if honor_delay:
            df = df.withColumn("_delay", gc["delay"])
        df = df.drop("robots_txt")
    else:
        df = frontier.withColumn("_allowed", F.lit(True))
    # trap / exclude-pattern / extension-deny / host-allow-list gates
    # (SEMANTICS.md §Traps / §Exclude patterns / §Extension deny / §Host
    # allow-list): pure codegen'd predicates, each folding to lit(False)
    # at its disabled default — round-invariant trees from _gate_cols
    df = df.withColumn("_trap", gc["trap"])
    df = df.withColumn("_excluded", gc["excluded"])
    df = df.withColumn("_ext", gc["ext"])
    df = df.withColumn("_hostdrop", gc["hostdrop"])
    b = F.broadcast(budgets.select("host", "budget", "backoff_until_round"))
    out = (
        df.join(b, on="host", how="left")
        .withColumn("budget", gc["budget0"])
        .withColumn("_backoff", gc["backoff0"] > F.lit(round_no))
        .drop("backoff_until_round")
    )
    if honor_delay:
        # delay ≤ 0 or absent ⇒ no cap; else budget = min(budget,
        # max(1, floor(round_seconds / delay))) — float division + floor,
        # same IEEE arithmetic as the oracle's kernel call
        out = out.withColumn("budget", gc["delay_budget"]).drop("_delay")
    # per-host lifetime emit cap (SEMANTICS.md §Host page cap): hosts at the
    # cap are flagged for permanent removal; uncapped hosts' budgets clip to
    # their remaining headroom. Totals are a per-host dimension joined with
    # the same SHUFFLE_HASH discipline as robots (host-scale, never
    # broadcast-built); lit(False)/no-join when the knob is off.
    if cfg.host_page_cap and emitted_totals is not None:
        out = out.join(
            emitted_totals.select("host", "emitted_total").hint("SHUFFLE_HASH"),
            on="host",
            how="left",
        )
        capped, clipped = host_cap_exprs(
            F.col("budget"), F.col("emitted_total"), cfg.host_page_cap
        )
        out = (
            out.withColumn("_capped", capped)
            .withColumn("budget", clipped)
            .drop("emitted_total")
        )
    else:
        out = out.withColumn("_capped", F.lit(False))
    return out


def split_robots(candidates: DataFrame, robots: DataFrame, cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """→ (allowed, denied). Hosts without a robots row are allowed.

    Scale: robots is per-host (≲50M rows at 10^10 URLs) — joined on the host
    key it shuffles with the frontier's own pk clustering, or broadcasts when
    small. Denied rows leave the frontier permanently (SEMANTICS §Round 1).
    """
    if not cfg.robots_enabled:
        return candidates, candidates.limit(0)
    # robots is per-host (frontier-scale, not dimension-scale): a broadcast
    # build would serialize ~robots-table-size work onto one thread; the
    # shuffle-hash join parallelizes it and never sorts the text blobs.
    joined = candidates.join(
        robots.select("host", "robots_txt").hint("SHUFFLE_HASH"),
        on="host",
        how="left",
    ).withColumn(
        "_allowed",
        make_robots_allowed_udf(cfg.user_agent, cfg.robots_wildcards_enabled)(
            F.col("canon_url"), F.col("robots_txt")
        ),
    )
    allowed = joined.where(F.col("_allowed")).drop("robots_txt", "_allowed")
    denied = joined.where(~F.col("_allowed")).drop("robots_txt", "_allowed")
    return allowed, denied


def attach_budget(candidates: DataFrame, budgets: DataFrame, cfg: CrawlConfig, round_no: int) -> tuple[DataFrame, DataFrame]:
    """→ (eligible_with_budget, backoff_skipped).

    Broadcast-joins the per-host budget/backoff dimension; hosts without a
    row get the default budget and no backoff. Backoff rows stay in the
    frontier (returned separately only for counters).
    """
    b = F.broadcast(budgets.select("host", "budget", "backoff_until_round"))
    joined = candidates.join(b, on="host", how="left").withColumn(
        "budget", F.coalesce(F.col("budget"), F.lit(cfg.default_budget))
    )
    in_backoff = F.coalesce(F.col("backoff_until_round"), F.lit(0)) > F.lit(round_no)
    eligible = joined.where(~in_backoff).drop("backoff_until_round")
    skipped = joined.where(in_backoff).drop("backoff_until_round")
    return eligible, skipped
