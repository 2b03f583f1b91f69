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
    return tables_digest({"t": df}, key_col)["t"]


def tables_digest(dfs: dict[str, DataFrame], key_col: str = "canon_url") -> dict:
    """Digest several tables in ONE Spark job (tagged union → one grouped
    aggregation) — digests are on the round's critical path, so each extra
    action is serial latency."""
    tagged = None
    for name, df in dfs.items():
        part = df.select(F.lit(name).alias("_t"), F.col("pk"), F.col(key_col).alias("_k"))
        tagged = part if tagged is None else tagged.unionByName(part)
    rows = (
        tagged.groupBy("_t", "pk")
        .agg(F.count("*").alias("n"), F.bit_xor(F.xxhash64("_k")).alias("x"))
        .collect()
    )
    out: dict[str, dict] = {name: {"rows": 0, "per_pk": {}} for name in dfs}
    for r in rows:
        d = out[r["_t"]]
        d["per_pk"][str(r["pk"])] = [r["n"], str(r["x"])]
        d["rows"] += r["n"]
    return out


def verify_table(df: DataFrame, expected: dict, key_col: str = "canon_url") -> bool:
    return table_digest(df, key_col) == expected
