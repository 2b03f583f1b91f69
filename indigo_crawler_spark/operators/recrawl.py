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
"""

from __future__ import annotations

from pyspark.sql import functions as F

from indigo_crawler_spark.plans import schemas

# priority term 1/(1+rank) ≈ 1e-6: refreshes rank below any real seed and
# below nothing else (t2 is additive) — pinned here and mirrored verbatim
# by the oracle, not a config knob
RECRAWL_SEED_RANK = 1 << 20


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
