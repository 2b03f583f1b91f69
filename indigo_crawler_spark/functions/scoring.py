"""Priority score as a pure column expression — SEMANTICS.md amendment.

Bit-identical to ``kernels/priority.py``: every term is one correctly-rounded
IEEE-754 double division; the sum associates left-to-right; the log is an
*integer* bit-length (length of the base-2 string via ``conv``), so no
transcendental function can diverge between the JVM and CPython.
Verified exactly (==, not approx) in tests/test_functions.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _bit_length(n: Column) -> Column:
    """bit_length of a positive integral column = length of its binary repr."""
    return F.length(F.conv(n.cast("string"), 10, 2))


def priority_expr(depth: Column, seed_rank: Column, host_count: Column) -> Column:
    """1/(1+depth) + [1/(1+seed_rank) if seed] + 1/bit_length(1+host_count)."""
    t1 = F.lit(1.0) / (F.lit(1.0) + depth.cast("double"))
    t2 = F.when(
        seed_rank.isNotNull(), F.lit(1.0) / (F.lit(1.0) + seed_rank.cast("double"))
    ).otherwise(F.lit(0.0))
    t3 = F.lit(1.0) / _bit_length(F.lit(1) + host_count.cast("long")).cast("double")
    return (t1 + t2) + t3


def aged_priority_expr(
    priority: Column, discovered_round: Column, round_no: int, weight: float
) -> Column:
    """Rank-time age boost (SEMANTICS.md §Priority aging) — bit-identical
    to ``kernels/priority.aged_priority``: priority + weight * age, one
    correctly-rounded double multiply then one add."""
    return priority.cast("double") + F.lit(float(weight)) * (
        F.lit(int(round_no)) - discovered_round.cast("int")
    ).cast("double")
