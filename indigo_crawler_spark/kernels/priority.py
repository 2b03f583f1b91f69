"""Priority-score kernel — SEMANTICS.md amendment to SURVEY.md §2.11.2.

Integer bit-length replaces log2 so that the Spark column expression
(``functions/scoring.py``) and this Python function produce bit-identical
IEEE-754 float64 values: every term is one correctly-rounded double division
and the sum is associated left-to-right.
"""

from __future__ import annotations


def priority_score(depth: int, seed_rank: int | None, host_count: int) -> float:
    """priority = 1/(1+depth) + [1/(1+seed_rank)] + 1/bit_length(1+host_count)."""
    t1 = 1.0 / (1.0 + depth)
    t2 = 0.0 if seed_rank is None else 1.0 / (1.0 + seed_rank)
    t3 = 1.0 / float((1 + host_count).bit_length())
    return (t1 + t2) + t3


def aged_priority(
    priority: float, discovered_round: int, round_no: int, weight: float
) -> float:
    """Starvation-avoiding age boost (SEMANTICS.md §Priority aging): the
    EFFECTIVE rank-time priority of a frontier row that has waited since
    *discovered_round*. One multiply and one add of correctly-rounded
    doubles in a pinned order, so the Spark expression
    (functions/scoring.aged_priority_expr) is bit-identical. The stored
    frontier priority never changes — age derives from the row's
    discovered_round at gate time, so deferral never compounds state."""
    return priority + weight * float(round_no - discovered_round)
