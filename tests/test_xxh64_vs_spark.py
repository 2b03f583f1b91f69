"""T0 — the pure-Python xxh64 reimplementation must equal Spark's F.xxhash64.

Everything downstream (host_hash, pk bucket assignment, fixture host_hash
columns) depends on this equivalence (SURVEY.md §7 risk 3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from indigo_crawler_spark.kernels.xxh64 import xxhash64

SAMPLES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "h1.example.org",
    "https://h1.example.org/p/123~",
    "x" * 31,
    "x" * 32,
    "x" * 33,
    "y" * 100,
    "Ünïcode-héllo-√∂",
    "多字节字符串测试",
]


def test_xxh64_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in SAMPLES:
        assert xxhash64(s) == got[s], f"mismatch for {s!r}"


def test_seed_param(spark):
    df = spark.createDataFrame([("hello",)], ["s"])
    h0 = df.select(F.xxhash64("s").alias("h")).collect()[0]["h"]
    assert xxhash64("hello", seed=42) == h0
    assert xxhash64("hello", seed=0) != h0  # seed actually matters
