"""Distributed PageRank over an edge DataFrame — the classic link-graph
priority signal: crawl schedulers rank frontier hosts/urls by it, and
training pipelines weight documents by it (a page many pages link to is
worth fetching sooner and keeping longer than a page nothing points at).

Semantics (normative, fixed-iteration — SQL-mirrorable): ranks start
uniform at 1/N over the node set (distinct src ∪ dst). Each of *iters*
synchronous iterations:

    rank'(v) = (1-d)/N + d · ( Σ_{u→v} rank(u)/outdeg(u)  +  D/N )

where ``D = Σ_{u: outdeg(u)=0} rank(u)`` is the dangling mass,
redistributed uniformly (the standard stochastic-matrix completion — rank
keeps summing to 1, which the tests pin). A FIXED iteration count, not a
convergence threshold, keeps the result a pure function of (edges, d,
iters) that an ANSI engine reproduces with unrolled CTEs (driver query
``pagerank_top``); crawl schedulers run few iterations anyway — frontier
ordering stabilizes long before the residual does.

Scale shape per iteration: one equi-join (ranks ⋈ edges on src) + one hash
agg (sum of contributions per dst) + one left join back onto the node set
— all shuffles on node keys, the same shape as connected_components. The
dangling mass is ONE scalar aggregate riding a tiny collect (O(1) rows);
out-degrees are computed once before the loop. Lineage is cut per
iteration with localCheckpoint so deep runs don't build deep plans. No
driver-side structure ever holds O(nodes) data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from indigo_crawler_spark.kernels.pagerank import PR_DAMP_PCT, PR_SCALE


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """→ (node, rank) for every node in *edges* after *iters* synchronous
    iterations with uniform dangling redistribution. Duplicate edges are
    collapsed (a link counts once); self-loops are legal (a page may link
    to itself). Ranks sum to 1 up to float error.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("_deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank", "_deg")
        # dangling mass: one scalar — the only driver-side value per iter
        dangling = (
            with_deg.where(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            with_deg.where(F.col("_deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("_deg")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    iters: int = 5,
) -> str:
    """ANSI mirror: unrolled CTE chain over *edges_sql* (a query producing
    columns src, dst), same uniform start / dangling redistribution. Meant
    for oracle-scale graphs — each iteration is one more CTE."""
    d = damping
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes, n)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank), 0) AS dm FROM {prev} r"
            " LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst, SUM(r.rank / deg.deg) AS cin"
            f" FROM {prev} r JOIN deg ON r.node = deg.src"
            " JOIN e ON e.src = r.node GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node,"
            f" (1 - {d}) / n.n + {d} * (COALESCE(c{i}.cin, 0) + d{i}.dm / n.n)"
            f" AS rank FROM nodes CROSS JOIN n CROSS JOIN d{i}"
            f" LEFT JOIN c{i} ON nodes.node = c{i}.dst)"
        )
        prev = f"r{i}"
    return "WITH " + ", ".join(parts) + f" SELECT node, rank FROM {prev}"


def pagerank_int(
    edges: DataFrame,
    iters: int = 5,
    scale: int = PR_SCALE,
    damping_pct: int = PR_DAMP_PCT,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """→ (node, rank_int) — the fixed-point integer PageRank that feeds
    frontier re-scoring (kernels/pagerank.py is normative; this reproduces
    it BIT-FOR-BIT because every aggregate is an int64 sum, which is
    exactly associative — unlike the float variant above, whose last-ulp
    depends on partition delivery order and which therefore must never
    touch an ordering contract). Same per-iteration scale shape as
    ``pagerank``: one equi-join + one hash agg + one left join on node
    keys, one scalar dangling aggregate, localCheckpoint lineage cuts.
    The returned frame is localCheckpoint-materialized, so callers can
    both write it and join it without recomputation."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank_int", F.lit(0).cast("long"))
    base = scale // n
    keep = 100 - damping_pct
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("_deg"))

    ranks = nodes.select("node", F.lit(base).cast("long").alias("rank_int"))
    for _ in range(iters):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "rank_int", "_deg")
        dangling = int(
            with_deg.where(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank_int"), F.lit(0)))
            .collect()[0][0]
        )
        share = dangling // n
        contrib = (
            with_deg.where(F.col("_deg").isNotNull())
            .join(e, with_deg["node"] == e["src"])
            .groupBy("dst")
            .agg(F.sum(F.expr("rank_int div _deg")).alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                F.expr(
                    f"CAST(({keep * base} + {damping_pct} *"
                    f" (COALESCE(_in, 0) + {share})) div 100 AS BIGINT)"
                ).alias("rank_int"),
            )
            .localCheckpoint()
        )
    return ranks


def rescore_frontier(
    frontier: DataFrame,
    ranks: DataFrame,
    host_counts: DataFrame,
    weight: float,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Re-score a frontier with link-graph ranks (SEMANTICS.md §PageRank
    priority): priority := priority_expr(depth, seed_rank, host_count)
    + weight · (rank_int / scale). The base is recomputed from scratch —
    priority is a pure function of columns the frontier already carries
    plus the static host_counts dimension — so a second tick never
    compounds an earlier boost. Unranked rows (urls not yet in the link
    graph) add exactly 0.0, which is bit-neutral for the positive base.

    Scale shape: one left join against the node-scale rank table and one
    against the host dimension, both SHUFFLE_HASH (at a 10^10-row frontier
    a broadcast build of either side would serialize); tick-cadence cost,
    never per-round."""
    from indigo_crawler_spark.functions.scoring import priority_expr
    from indigo_crawler_spark.plans import schemas

    r = ranks.select(F.col("node").alias("canon_url"), "rank_int")
    hc = host_counts.select("host", "host_count")
    boost = F.when(
        F.col("rank_int").isNotNull(),
        F.lit(float(weight)) * (F.col("rank_int").cast("double") / F.lit(float(scale))),
    ).otherwise(F.lit(0.0))
    return (
        frontier.drop("priority")
        .join(r.hint("SHUFFLE_HASH"), on="canon_url", how="left")
        .join(hc.hint("SHUFFLE_HASH"), on="host", how="left")
        .withColumn(
            "priority",
            priority_expr(
                F.col("depth"),
                F.col("seed_rank"),
                F.coalesce(F.col("host_count"), F.lit(0)),
            )
            + boost,
        )
        .select(*[f.name for f in schemas.FRONTIER.fields])
    )


def pagerank_int_oracle_sql(
    edges_sql: str,
    iters: int = 5,
    scale: int = PR_SCALE,
    damping_pct: int = PR_DAMP_PCT,
) -> str:
    """SQL mirror of ``pagerank_int`` — unrolled integer CTEs (// is the
    engine's floor division on the positive integers involved). Because the
    math is all-integer the comparison is EXACT equality, not
    rounded-float: the one property the float mirror above cannot give."""
    keep = 100 - damping_pct
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT count(*) AS n FROM nodes)",
        f"b AS (SELECT CAST({scale} // n.n AS BIGINT) AS base FROM n)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src)",
        "r0 AS (SELECT node, b.base AS rank_int FROM nodes, b)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(r.rank_int), 0) AS dm FROM {prev} r"
            " LEFT JOIN deg ON r.node = deg.src WHERE deg.src IS NULL)"
        )
        parts.append(
            f"c{i} AS (SELECT e.dst, SUM(r.rank_int // deg.deg) AS cin"
            f" FROM {prev} r JOIN deg ON r.node = deg.src"
            " JOIN e ON e.src = r.node GROUP BY e.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT nodes.node, CAST(({keep} * b.base"
            f" + {damping_pct} * (COALESCE(c{i}.cin, 0) + d{i}.dm // n.n))"
            f" // 100 AS BIGINT) AS rank_int"
            f" FROM nodes CROSS JOIN n CROSS JOIN b CROSS JOIN d{i}"
            f" LEFT JOIN c{i} ON nodes.node = c{i}.dst)"
        )
        prev = f"r{i}"
    return "WITH " + ", ".join(parts) + f" SELECT node, rank_int FROM {prev}"
