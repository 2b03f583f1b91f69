"""Fixed-point integer PageRank — the NORMATIVE kernel for link-graph
frontier prioritization (SEMANTICS.md §PageRank priority).

Why integers: the engine re-scores frontier priorities from these ranks,
and frontier ordering feeds the crawl's bit-exact contracts (resume
replay, engine ≡ oracle ordering, lineage digests). A float PageRank is
NOT reproducible on a cluster — Spark's hash aggregation sums each node's
incoming contributions in whatever order partitions deliver them, and
float addition is non-associative, so two runs of the same job can differ
in the last ulp and flip the order of two near-tied frontier rows. Every
quantity here is an int64 and every operation is integer add / multiply /
floor-divide, all exactly associative and commutative, so the distributed
engine (operators/pagerank.py ``pagerank_int``) reproduces this kernel
bit-for-bit regardless of partitioning, and a resumed run re-derives the
identical rescored frontier.

Semantics (damping d = damping_pct/100, N = |distinct src ∪ dst|,
``base = scale // N``, all divisions floor):

    rank0(v)  = base
    contrib(v) = Σ_{u→v} rank(u) // outdeg(u)
    dangling   = Σ_{outdeg(u)=0} rank(u);  share = dangling // N
    rank'(v)  = ((100-damping_pct)·base + damping_pct·(contrib(v)+share)) // 100

Fixed iteration count (pure function of (edges, iters)); duplicate edges
collapse; self-loops legal. Total mass starts ≤ scale and is
non-increasing (floors only lose), so with scale = 10^12 every
intermediate fits comfortably in int64 (≤ 100·scale = 10^14) — true at
10^10 nodes as much as at 10.

The rank a frontier row receives is ``weight · (rank_int / scale)`` added
to its base priority — one float division + one multiply + one add, each
correctly rounded, identical on JVM and CPython.
"""

from __future__ import annotations

from collections.abc import Iterable

PR_SCALE = 10**12
PR_DAMP_PCT = 85


def pagerank_int_py(
    edges: Iterable[tuple[str, str]],
    iters: int = 5,
    scale: int = PR_SCALE,
    damping_pct: int = PR_DAMP_PCT,
) -> dict[str, int]:
    """→ {node: rank_int} over distinct(src ∪ dst); {} for an empty graph."""
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = {(s, d) for s, d in edges}
    nodes = {s for s, _ in e} | {d for _, d in e}
    n = len(nodes)
    if n == 0:
        return {}
    base = scale // n
    outdeg: dict[str, int] = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: base for v in nodes}
    keep = 100 - damping_pct
    for _ in range(iters):
        contrib = dict.fromkeys(nodes, 0)
        for s, d in e:
            contrib[d] += rank[s] // outdeg[s]
        dangling = sum(rank[v] for v in nodes if v not in outdeg)
        share = dangling // n
        rank = {
            v: (keep * base + damping_pct * (contrib[v] + share)) // 100
            for v in nodes
        }
    return rank
