"""A2 — in-round dedup with normative tie-breaks (SEMANTICS.md §Round 7).

``min_by`` over a struct gives "keep the row minimizing (k1, k2, ...)" as a
single partial+final hash aggregation (map-side combine for free) — never a
window, never dropDuplicates (whose survivor is partition-order-dependent
and therefore non-deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_min_by(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """One row per *key*: the row minimizing struct(*order_cols).

    Struct comparison in Spark is lexicographic field-by-field, matching the
    oracle's tuple comparison. Output keeps all input columns.
    """
    others = [c for c in df.columns if c != key]
    packed = df.select(
        key, F.struct(*order_cols).alias("_ord"), F.struct(*others).alias("_row")
    )
    won = packed.groupBy(key).agg(F.min_by("_row", "_ord").alias("_row"))
    return won.select(key, "_row.*")
