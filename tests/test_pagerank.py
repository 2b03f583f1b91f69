"""PageRank (operators/pagerank.py): numpy power-iteration oracle with the
same dangling rule, hand-computable structure checks, DuckDB unrolled-CTE
equivalence (the driver query `pagerank_scores` pins it on the orders
graph; here a direct small-graph check)."""

from __future__ import annotations

import numpy as np
import pytest

from indigo_crawler_spark.operators.pagerank import pagerank, pagerank_oracle_sql


def numpy_pagerank(edges, d=0.85, iters=5):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    dedup = sorted(set(edges))
    deg = np.zeros(n)
    for a, _ in dedup:
        deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        nxt = np.full(n, (1 - d) / n + d * dangling / n)
        for a, b in dedup:
            nxt[idx[b]] += d * r[idx[a]] / deg[idx[a]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (1, 2),  # dup edge collapses
    (5, 5),                                           # self-loop legal
    (3, 6),                                           # 6 is dangling
]


class TestPagerank:
    def test_matches_numpy_oracle(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 5).collect()}
        want = numpy_pagerank(EDGES)
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v

    def test_ranks_sum_to_one(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        total = sum(r["rank"] for r in pagerank(df, 0.85, 7).collect())
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_structure_hub_beats_leaf(self, spark):
        # everyone links to h; h links back to everyone (no oscillation —
        # a hub that funnels to ONE node alternates mass with it instead)
        edges = [(1, 9), (2, 9), (3, 9), (4, 9),
                 (9, 1), (9, 2), (9, 3), (9, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 10).collect()}
        assert got[9] == max(got.values())
        assert got[9] > 2 * got[2]

    def test_duckdb_unrolled_cte_matches(self, spark):
        import duckdb

        con = duckdb.connect()
        con.execute("CREATE TABLE ed (src BIGINT, dst BIGINT)")
        con.executemany("INSERT INTO ed VALUES (?, ?)", EDGES)
        sql = pagerank_oracle_sql("SELECT src, dst FROM ed", 0.85, 5)
        want = {n: r for n, r in con.execute(sql).fetchall()}
        df = spark.createDataFrame(EDGES, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 5).collect()}
        assert set(got) == set(want)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v

    def test_damping_bounds(self, spark):
        df = spark.createDataFrame(EDGES, "src long, dst long")
        with pytest.raises(ValueError, match="damping"):
            pagerank(df, damping=1.0)
