"""J4/W2 — explicit heavy-host skew handling (SURVEY.md §2.4/§2.6).

AQE splits skewed *joins* but never skew-splits *window* partitions, so a
host with millions of frontier candidates would serialize the politeness
window into one task. Fix: two-phase salted top-k —

  phase 1: within (host, salt) keep rank ≤ budget   [salt spreads the host
           over `num_salts` tasks; salt = pmod(xxhash64(canon_url), S) is
           a pure function of the row — fully deterministic]
  phase 2: within host (≤ S·budget rows now) keep rank ≤ budget, assigning
           the final rank_in_host.

Exactness (superset property): a row's true in-host rank is ≥ its in-salt
rank, so nothing in the true top-B is thinned in phase 1; conversely every
row surviving phase 1 with true rank > B still ranks > B in phase 2 because
the entire true top-B survives above it. Ranks are therefore identical to
the unsalted window — verified against the oracle in T2 with a forced-low
threshold.

WHICH hosts to salt is a purely *physical* choice (any selection yields
identical results), so the engine derives the dimension from data it has
already paid for — never a per-round count+collect detection job (at 1000
executors that action is pure serial driver latency every round):

  * bootstrap: hosts whose PAGE count exceeds ``cfg.salt_threshold`` (the
    corpus proxy — link graphs concentrate on hosts that dominate the
    corpus);
  * per round R: hosts whose frontier CANDIDATE count in round R-1's gate
    frame exceeded the same threshold (``heavy_hosts_frontier/round=R``, an
    agg riding the cached gate pass + a pooled write in plans/round.py) —
    so a link-farm host with few corpus pages but 10^8 discovered URLs is
    salted from the round after it first turns heavy. One round of lag,
    never wrong (salting any subset of hosts is output-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.operators.politeness import politeness_topk


def politeness_topk_skew_aware(
    df: DataFrame, cfg: CrawlConfig, heavy_hosts: DataFrame | None
) -> DataFrame:
    """politeness_topk with explicit salting for the *heavy_hosts* dimension
    (None/empty ⇒ plain window). Result (rows AND rank_in_host values) is
    identical to ``politeness_topk(df)``; only the physical plan differs.
    """
    if heavy_hosts is None:
        return politeness_topk(df)

    # heavy_hosts is dimension-sized by construction (≤ hosts over the page
    # threshold) — broadcast it; never an isin literal list (a 10k-literal
    # In-expression bloats codegen).
    heavy_b = F.broadcast(heavy_hosts.select("host"))
    light = df.join(heavy_b, on="host", how="left_anti")
    heavy_rows = df.join(heavy_b, on="host", how="left_semi").withColumn(
        "_salt", F.pmod(F.xxhash64("canon_url"), F.lit(cfg.num_salts))
    )

    from pyspark.sql import Window

    w1 = Window.partitionBy("host", "_salt").orderBy(
        F.desc("priority"), F.asc("canon_url")
    )
    thinned = (
        heavy_rows.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= F.col("budget"))
        .drop("_salt", "_r1")
    )
    return politeness_topk(light).unionByName(politeness_topk(thinned))
