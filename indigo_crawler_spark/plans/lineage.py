"""C3 — per-partition lineage digests (SURVEY.md §2.9, BASELINE.json:14).

Each committed table gets a per-pk fingerprint — ``bit_xor(xxhash64(canon_url))``
plus a row count — recorded in the round manifest. XOR is order-insensitive,
so the digest is stable under any task/partition ordering while still
detecting lost, duplicated, or corrupted rows per bucket. ``verify_table``
recomputes and compares on resume (EP2) before trusting a snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_digest(df: DataFrame, key_col: str = "canon_url") -> dict:
    """{pk: [count, xor]} plus totals, JSON-serializable."""
    rows = (
        df.groupBy("pk")
        .agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(key_col)).alias("x"),
        )
        .collect()
    )
    per_pk = {str(r["pk"]): [r["n"], str(r["x"])] for r in rows}
    return {
        "rows": sum(r["n"] for r in rows),
        "per_pk": per_pk,
    }


def verify_table(df: DataFrame, expected: dict, key_col: str = "canon_url") -> bool:
    return table_digest(df, key_col) == expected
