"""Plan-shape regressions (SURVEY.md §4 / M4): the physical plans we rely on
for scale must not silently degrade — shuffle counts, no single-partition
bottlenecks, partition pruning reaching the page-store scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _n_exchanges(df) -> int:
    p = _physical(df)
    return sum(1 for ln in p.splitlines() if "Exchange" in ln and "Reused" not in ln)


@pytest.fixture()
def frontier_like(spark):
    return spark.createDataFrame(
        [
            (f"https://h{i % 7}.com/p/{i}", f"h{i % 7}.com", float(i % 13), 8)
            for i in range(200)
        ],
        "canon_url string, host string, priority double, budget int",
    )


def test_politeness_window_single_shuffle(spark, frontier_like):
    from indigo_crawler_spark.operators.politeness import politeness_topk

    out = politeness_topk(frontier_like)
    # one hash exchange (by host) feeds the window sort — nothing else
    assert _n_exchanges(out) == 1
    assert "SinglePartition" not in _physical(out)


def test_sequence_batches_no_single_partition_window(spark, frontier_like):
    from indigo_crawler_spark.operators.politeness import sequence_batches

    out, n, _, cached = sequence_batches(frontier_like, 0, 1000, 100)
    assert n == frontier_like.count()
    # distributed rank: range exchange, never a SinglePartition window
    phys = _physical(out)
    assert "rangepartitioning" in phys.lower()
    assert "SinglePartition" not in phys
    assert "Window" not in phys  # rank comes from mapInPandas, not a window
    cached.unpersist()


def test_dedup_min_by_single_shuffle(spark, frontier_like):
    from indigo_crawler_spark.operators.dedup import dedup_min_by

    out = dedup_min_by(frontier_like, "canon_url", ["priority"])
    assert _n_exchanges(out) == 1  # partial+final hash agg, one exchange


def test_dedup_reuses_pk_partitioning(spark, frontier_like):
    """groupBy(pk, key) on a frame already repartitioned by pk must not add
    a second exchange (partition keys ⊆ grouping keys)."""
    from indigo_crawler_spark.operators.dedup import dedup_min_by

    pre = frontier_like.withColumn("pk", F.pmod(F.xxhash64("host"), F.lit(8))).repartition(
        8, "pk"
    )
    out = dedup_min_by(pre, ["pk", "canon_url"], ["priority"])
    assert _n_exchanges(out) == 1  # only the explicit repartition


def test_store_scan_partition_pruning(spark, tmp_path):
    """The fetch path's pk filter must reach the parquet scan as a partition
    filter (directory pruning), not a post-scan filter."""
    df = spark.createDataFrame(
        [(f"https://h{i}.com/", i % 8, bytearray(b"<html/>")) for i in range(64)],
        "canon_url string, pk int, html binary",
    )
    df.write.mode("overwrite").partitionBy("pk").parquet(str(tmp_path / "store"))
    store = spark.read.parquet(str(tmp_path / "store")).where(F.col("pk").isin([1, 3]))
    phys = _physical(store)
    assert "PartitionFilters" in phys
    seg = phys[phys.index("PartitionFilters") :][:200]
    assert "pk" in seg
    # pruned read: only 2 of 8 directories
    assert store.select("pk").distinct().count() == 2


def test_filter_pushdown_to_parquet(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"u{i}", float(i)) for i in range(100)], "id long, u string, v double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "t"))
    scan = spark.read.parquet(str(tmp_path / "t")).where(F.col("v") > 50.0).select("id")
    phys = _physical(scan)
    assert "PushedFilters: [IsNotNull(v), GreaterThan(v,50.0)]" in phys
    # column pruning: html-free ReadSchema
    assert "ReadSchema" in phys and "u:string" not in phys.replace(" ", "")


def test_budget_join_is_broadcast(spark, frontier_like):
    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.operators.gates import attach_budget

    budgets = spark.createDataFrame(
        [("h1.com", -1, 3, 0)],
        "host string, host_hash long, budget int, backoff_until_round int",
    )
    eligible, _ = attach_budget(
        frontier_like.drop("budget"), budgets, CrawlConfig(), 0
    )
    assert "BroadcastHashJoin" in _physical(eligible)


def test_pagerank_rescore_joins_are_shuffle_hash(spark):
    """The PageRank rescore (operators/pagerank.py rescore_frontier) joins
    a frontier-scale table against the node-scale rank table and the host
    dimension — at a 10^10-row frontier neither side may become a
    broadcast build (serializes the tick) nor a sort-merge join (sorts
    two giant sides). Both joins must honor their SHUFFLE_HASH hints."""
    from indigo_crawler_spark.operators.pagerank import rescore_frontier
    from indigo_crawler_spark.plans import schemas

    frontier = spark.createDataFrame(
        [
            (f"https://h{i % 7}.com/p/{i}", f"h{i % 7}.com", i, i % 16, 1, None, 0.5, 0)
            for i in range(50)
        ],
        schemas.FRONTIER,
    )
    ranks = spark.createDataFrame(
        [(f"https://h{i % 7}.com/p/{i}", 10**9 + i) for i in range(30)],
        schemas.PAGERANK,
    )
    hc = spark.createDataFrame(
        [(f"h{i}.com", i + 1) for i in range(7)], schemas.HOST_COUNTS
    )
    out = rescore_frontier(frontier, ranks, hc, weight=2.0)
    plan = _physical(out)
    assert plan.count("ShuffledHashJoin") == 2
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan
    # and the output schema is exactly the frontier contract
    assert [f.name for f in out.schema.fields] == [
        f.name for f in schemas.FRONTIER.fields
    ]


def test_mirror_pairs_all_shuffle_hash(spark):
    """F84 mirror mining at corpus scale must never sort-merge or go
    cartesian: evidence dedup, the hot-sha guard, pair mining and the
    totals joins are hash aggregates + ShuffledHashJoins only."""
    from indigo_crawler_spark.operators.mirrors import mirror_pairs

    df = spark.createDataFrame(
        [(f"h{i % 5}.com", f"s{i % 11}") for i in range(100)],
        "host string, text_sha string",
    )
    p = _physical(mirror_pairs(df))
    assert "ShuffledHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_host_stats_two_aggs_no_cartesian(spark):
    """F88 host report: two partial+final hash aggs and one host-keyed
    full-outer join — text must not survive past the token-count agg."""
    from indigo_crawler_spark.operators.hoststats import host_stats

    b = spark.createDataFrame(
        [(f"h{i % 5}.com", "ok", i % 3) for i in range(50)],
        "host string, status string, round int",
    )
    t = spark.createDataFrame(
        [(f"h{i % 5}.com", "w1 w2 w3") for i in range(50)],
        "host string, text string",
    )
    out = host_stats(b, t)
    p = _physical(out)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert p.count("HashAggregate") >= 4  # partial+final on both sides
    # text is pruned before the join: no join operator lists a text column
    for ln in p.splitlines():
        if "Join" in ln:
            assert "text" not in ln
