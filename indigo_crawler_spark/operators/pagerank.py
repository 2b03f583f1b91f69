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
