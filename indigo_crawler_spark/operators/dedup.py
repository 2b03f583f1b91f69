"""A2 — in-round dedup with normative tie-breaks (SEMANTICS.md §Round 7).

``min_by`` over a struct gives "keep the row minimizing (k1, k2, ...)" as a
single partial+final hash aggregation (map-side combine for free) — never a
window, never dropDuplicates (whose survivor is partition-order-dependent
and therefore non-deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_min_by(df: DataFrame, key: str | list[str], order_cols: list[str]) -> DataFrame:
    """One row per *key*: the row minimizing struct(*order_cols).

    Struct comparison in Spark is lexicographic field-by-field, matching the
    oracle's tuple comparison. Output keeps all input columns.

    *key* may be a list — e.g. ``['pk', 'canon_url']`` on a DataFrame already
    hash-partitioned by pk: HashPartitioning(pk) satisfies the clustering
    requirement of groupBy(pk, canon_url) (partition keys ⊆ grouping keys),
    so the aggregation runs shuffle-free on the existing layout.
    """
    keys = [key] if isinstance(key, str) else list(key)
    others = [c for c in df.columns if c not in keys]
    packed = df.select(
        *keys, F.struct(*order_cols).alias("_ord"), F.struct(*others).alias("_row")
    )
    won = packed.groupBy(*keys).agg(F.min_by("_row", "_ord").alias("_row"))
    return won.select(*keys, "_row.*")
