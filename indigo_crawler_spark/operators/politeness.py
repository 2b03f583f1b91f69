"""W1/W3/O1 — per-host politeness top-B + global bounded top-K sequencing.

SEMANTICS.md §Round 3-5. The per-host window shuffles once on the host key;
the global sequencing is a *bounded* top-K (K = cfg.round_limit), so the
single-partition tail only ever sees ≤K rows — at 10^10-URL frontier scale
the global sort never materializes the frontier (SURVEY.md §2.6 W3).

Skew note (M4): heavy hosts get pre-thinned by the two-phase salted top-k in
``operators/skew.py`` before this window; the superset property keeps W1
exact. AQE cannot skew-split windows, hence the explicit pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_topk(df: DataFrame, budget_col: str = "budget") -> DataFrame:
    """Keep ≤budget rows per host, ranked (priority DESC, canon_url ASC).

    Adds ``rank_in_host``; drops rows beyond the host budget.
    """
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("canon_url"))
    return (
        df.withColumn("rank_in_host", F.row_number().over(w))
        .where(F.col("rank_in_host") <= F.col(budget_col))
    )


def sequence_batches(df: DataFrame, round_no: int, limit: int, batch_size: int) -> DataFrame:
    """Global order (priority DESC, canon_url ASC) → top-*limit* rows with
    global_rank / batch_id — the emitted crawl ordering (BASELINE.json:2).

    orderBy().limit() compiles to TakeOrderedAndProject (per-partition top-K
    then driver-side merge of K); the row_number window then runs on ≤K rows.
    """
    topk = df.orderBy(F.desc("priority"), F.asc("canon_url")).limit(limit)
    w = Window.orderBy(F.desc("priority"), F.asc("canon_url"))
    return (
        topk.withColumn("global_rank", F.row_number().over(w))
        .withColumn(
            "batch_id",
            ((F.col("global_rank") - F.lit(1)) / F.lit(batch_size)).cast("int"),
        )
        .withColumn("round", F.lit(round_no))
    )
