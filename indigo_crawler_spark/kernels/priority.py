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
