"""Closed-loop backoff — the reference's ban→demote/backoff feedback
(SURVEY.md §3 EP3: "banned→demote/backoff → fetch_batches.status feeding
host_budgets.backoff_until_round next round").

The reference crawler demotes a proxy and backs a task off when a fetch
comes back as a ban page. The batch analogue: every emitted URL gets a
``status`` ("ok"/"banned"); hosts with ≥1 banned fetch in round R are
backed off until round R + 1 + ``cfg.backoff_rounds`` (exclusive upper
bound: they re-enter at that round). Budgets are versioned per round
(``host_budgets/round=R``) so resume replays the fold deterministically.

There is no network in a batch engine, so the fetch outcome is a
deterministic pure function of the URL (SEMANTICS.md §Backoff):
``banned ⇔ pmod(xxhash64(canon_url), cfg.ban_every) == 0`` — the oracle
computes the same with the shared pure-Python xxh64 kernel. ``ban_every=0``
disables the loop (all "ok", no versioned writes).

Scale shape: statuses are bounded by the round cap K → the banned-host set
is ≤K rows; the fold is one small join against the dimension-sized budgets
table (the same table the gate pass broadcasts), overlapped with the
fetch/extract stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.config import CrawlConfig


def fetch_status_expr(cfg: CrawlConfig, attempt: Column | None = None) -> Column:
    """Deterministic synthetic fetch outcome for an emitted canon_url.

    Precedence banned → failed → ok (a ban is a CONTENT outcome — the
    fetch succeeded and returned a ban page — so it wins over the
    transient-failure draw). With ``cfg.fail_every`` > 0 and *attempt*
    (the url's failure count so far, SEMANTICS.md §Transient failures):
    ``failed ⇔ pmod(xxhash64(canon_url || ':' || attempt), fail_every) ==
    1 % fail_every`` — the attempt salt makes retries independent draws,
    so a url can fail round R and succeed round R+1 (the path a url-only
    hash could never produce). The residue target is ``1 % fail_every``,
    not a bare 1: residue 1 keeps the draw independent of the ban draw
    (residue 0 of an unsalted hash) for every_n ≥ 2, while ``1 % 1 = 0``
    makes ``fail_every=1`` mean "every fetch fails" instead of the
    unsatisfiable ``pmod(x, 1) == 1`` silent no-op."""
    out = F.lit("ok")
    if cfg.fail_every:
        if attempt is None:
            raise ValueError("fail_every > 0 requires the attempt column")
        out = F.when(
            F.pmod(
                F.xxhash64(
                    F.concat(
                        F.col("canon_url"), F.lit(":"), attempt.cast("string")
                    )
                ),
                F.lit(cfg.fail_every),
            )
            == F.lit(1 % cfg.fail_every),
            F.lit("failed"),
        ).otherwise(out)
    if cfg.ban_every:
        out = F.when(
            F.pmod(F.xxhash64("canon_url"), F.lit(cfg.ban_every)) == 0,
            F.lit("banned"),
        ).otherwise(out)
    return out


def retry_exprs(
    status: Column, attempt: Column, max_retries: int
) -> dict[str, Column]:
    """Retry bookkeeping (SEMANTICS.md §Transient failures), shared by the
    round plan and the SQL-checked driver query: a failed url whose
    failure count so far has REACHED ``max_retries`` is exhausted (gives
    up — enters seen like a fetched url, leaves the crawl); a failed url
    below it is retained (stays in the frontier, fails+1 recorded). With
    ``max_retries = 0`` the first failure exhausts (fail-once, never
    retry)."""
    failed = status == "failed"
    exhausted = failed & (attempt >= F.lit(int(max_retries)))
    return {
        "failed": failed,
        "exhausted": exhausted,
        "retained": failed & ~exhausted,
        "fails_next": (attempt + 1).cast("int"),
    }


def fold_backoff(
    budgets: DataFrame, statuses: DataFrame, round_no: int, cfg: CrawlConfig
) -> DataFrame:
    """host_budgets' for round R+1 from round R's fetch statuses.

    *budgets*: (host, host_hash, budget, backoff_until_round); *statuses*:
    (host, status). Hosts with any "banned" status get
    ``backoff_until_round = greatest(existing, R + 1 + cfg.backoff_rounds)``;
    a banned host with no budgets row gets one (default budget). Hosts
    without bans pass through unchanged.
    """
    banned = (
        statuses.where(F.col("status") == "banned").select("host").distinct()
        .withColumn("_hot", F.lit(True))
    )
    return _fold_hot_hosts(budgets, banned, round_no, cfg)


def _fold_hot_hosts(
    budgets: DataFrame,
    hot: DataFrame,
    round_no: int,
    cfg: CrawlConfig,
    marker: str | None = None,
) -> DataFrame:
    """The one full-outer greatest() fold both feedback paths share:
    *hot* is (host, _hot=True); hot hosts get ``backoff_until_round =
    greatest(existing, round_no + 1 + cfg.backoff_rounds)``, a hot host
    with no budgets row gets one (default budget), cold hosts pass
    through unchanged. With *marker* the _hot flag survives under that
    name (coalesced to False) so the caller's Observation can count
    triggered hosts on the write. Full outer because a hot host may lack
    a budgets row; broadcast builds don't apply to full-outer joins, but
    both sides are small (budgets is the dimension the gate pass
    broadcasts, hot is ≤K hosts), so the shuffle is trivial. The
    greatest() fold commutes with itself (same ``until``), so ban/fail
    fold order is irrelevant."""
    until = F.lit(round_no + 1 + cfg.backoff_rounds)
    cols = [
        F.col("host"),
        F.coalesce(F.col("host_hash"), F.xxhash64("host")).alias("host_hash"),
        F.coalesce(F.col("budget"), F.lit(cfg.default_budget))
        .cast("int")
        .alias("budget"),
        F.when(
            F.coalesce(F.col("_hot"), F.lit(False)),
            F.greatest(
                F.coalesce(F.col("backoff_until_round"), F.lit(0)), until
            ),
        )
        .otherwise(F.coalesce(F.col("backoff_until_round"), F.lit(0)))
        .cast("int")
        .alias("backoff_until_round"),
    ]
    if marker is not None:
        cols.append(F.coalesce(F.col("_hot"), F.lit(False)).alias(marker))
    return budgets.join(hot, on="host", how="full_outer").select(*cols)


def fold_fail_hosts(
    budgets: DataFrame, statuses: DataFrame, round_no: int, cfg: CrawlConfig
) -> DataFrame:
    """Dead-host backoff (SEMANTICS.md §Transient failures): hosts whose
    round-R FAILED fetch count reaches ``cfg.fail_host_threshold`` back
    off exactly like banned hosts — ``backoff_until_round =
    greatest(existing, R + 1 + cfg.backoff_rounds)``. A host that is DOWN
    (every fetch timing out) would otherwise burn a politeness slot per
    retained-failure url every single round; the threshold converts a
    failure burst into the same closed-loop pause a ban triggers, and the
    retained urls simply wait out the backoff in the frontier.

    Returns budgets' carrying a ``_failhost`` marker column — the caller
    attaches an Observation summing it (the triggered-host counter rides
    the budgets write, zero extra jobs) and drops it before the write.
    Scale shape: *statuses* is the cached ≤K emitted slice → one tiny
    hash agg; the fold itself is _fold_hot_hosts, shared with
    fold_backoff so the ban and fail paths cannot drift apart."""
    hot = (
        statuses.where(F.col("status") == "failed")
        .groupBy("host")
        .agg(F.count("*").alias("_nf"))
        .where(F.col("_nf") >= F.lit(int(cfg.fail_host_threshold)))
        .select("host", F.lit(True).alias("_hot"))
    )
    return _fold_hot_hosts(budgets, hot, round_no, cfg, marker="_failhost")


def fold_thin_hosts(
    budgets: DataFrame, extracted: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """Thin-content demotion (SEMANTICS.md §Thin-host demotion): hosts whose
    round-R fetches average fewer than ``cfg.thin_host_min_words``
    whitespace tokens of extracted text get ``budget = greatest(1,
    budget div 2)`` entering round R+1. The mean is compared as integers —
    ``sum(words) < min_words * n_pages`` — so engine and oracle agree
    bit-for-bit with no float division anywhere; the token count expr is
    pinned operation-for-operation against kernels/tokens.py.

    Returns budgets' carrying a ``_thin_demoted`` marker column — the
    caller attaches an Observation summing it (so the counter rides the
    budgets write, zero extra jobs) and drops it before the write.
    Scale shape: *extracted* is the cached ≤K-row emitted slice;
    the per-host stats are one tiny hash agg, the fold one small full-outer
    join against the dimension-sized budgets table (a thin host may lack a
    budgets row — it gets one at half the default, matching the oracle).
    Compounds across consecutive thin rounds by construction (the halved
    budget is what the next fold reads)."""
    from indigo_crawler_spark.functions.keys import host_expr
    from indigo_crawler_spark.functions.text_analysis import (
        whitespace_token_count,
    )

    stats = (
        extracted.select(
            host_expr("canon_url").alias("host"),
            whitespace_token_count(F.col("text")).alias("_w"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("_pages"),
            F.coalesce(F.sum("_w"), F.lit(0)).alias("_words"),
        )
        .where(
            F.col("_words")
            < F.lit(cfg.thin_host_min_words) * F.col("_pages")
        )
        .select("host", F.lit(True).alias("_thin"))
    )
    marked = budgets.join(stats, on="host", how="full_outer").select(
        "host",
        F.coalesce(F.col("host_hash"), F.xxhash64("host")).alias("host_hash"),
        F.when(
            F.coalesce(F.col("_thin"), F.lit(False)),
            F.greatest(
                F.lit(1),
                F.expr(
                    f"coalesce(budget, {cfg.default_budget}) div 2"
                ).cast("int"),
            ),
        )
        .otherwise(F.coalesce(F.col("budget"), F.lit(cfg.default_budget)))
        .cast("int")
        .alias("budget"),
        F.coalesce(F.col("backoff_until_round"), F.lit(0))
        .cast("int")
        .alias("backoff_until_round"),
        F.coalesce(F.col("_thin"), F.lit(False)).alias("_thin_demoted"),
    )
    return marked
