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

Only hosts whose candidate count exceeds ``cfg.salt_threshold`` take the
salted path; the rest use the plain window. The per-host counts double as
the skew metric (SURVEY A1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.operators.politeness import politeness_topk


def politeness_topk_skew_aware(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """politeness_topk with explicit salting for heavy hosts.

    Result (rows AND rank_in_host values) is identical to
    ``politeness_topk(df)``; only the physical plan differs.
    """
    # ONE job decides: collect the heavy-host list (bounded — by definition
    # at most total/threshold hosts can exceed the threshold, and we only
    # need the first few thousand to pick a strategy).
    heavy_hosts = [
        r["host"]
        for r in df.groupBy("host")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cfg.salt_threshold)
        .select("host")
        .limit(100_000)
        .collect()
    ]
    if not heavy_hosts:
        return politeness_topk(df)

    if len(heavy_hosts) <= 10_000:
        is_heavy = F.col("host").isin(heavy_hosts)
        light = df.where(~is_heavy)
        heavy_rows = df.where(is_heavy)
    else:
        heavy = df.sparkSession.createDataFrame([(h,) for h in heavy_hosts], ["host"])
        heavy_b = F.broadcast(heavy)
        light = df.join(heavy_b, on="host", how="left_anti")
        heavy_rows = df.join(heavy_b, on="host", how="left_semi")
    heavy_rows = heavy_rows.withColumn(
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
