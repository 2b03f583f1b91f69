"""T1 — Spark column expressions must be BIT-identical to the kernels."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from indigo_crawler_spark.functions.keys import (
    host_expr,
    host_hash_expr,
    pk_expr,
    url_hash_expr,
)
from indigo_crawler_spark.functions.scoring import priority_expr
from indigo_crawler_spark.functions.udfs import canonicalize_udf
from indigo_crawler_spark.kernels.canonicalize import canonicalize_url
from indigo_crawler_spark.kernels.keys import pk_of_host_hash, url_hash
from indigo_crawler_spark.kernels.priority import priority_score
from indigo_crawler_spark.kernels.xxh64 import xxhash64


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_priority_expr_bit_identical(spark):
    grid = [
        (d, s, hc)
        for d in (0, 1, 2, 5, 17)
        for s in (None, 0, 1, 7, 99, 10**6)
        for hc in (0, 1, 2, 3, 7, 8, 1000, 10**9)
    ]
    df = spark.createDataFrame(grid, "depth int, seed_rank int, host_count long")
    rows = df.select(
        "depth", "seed_rank", "host_count",
        priority_expr(F.col("depth"), F.col("seed_rank"), F.col("host_count")).alias("p"),
    ).collect()
    for r in rows:
        expect = priority_score(r["depth"], r["seed_rank"], r["host_count"])
        assert _bits(r["p"]) == _bits(expect), (r, expect)


def test_key_exprs_match_kernels(spark):
    urls = [
        "https://h1.example.org/p/123~",
        "http://a.com/",
        "https://user:p@a.com:8080/x?q=1",
        "http://[::1]:8080/a",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["canon_url"])
    rows = df.select(
        "canon_url",
        host_expr("canon_url").alias("host"),
        url_hash_expr("canon_url").alias("uh"),
    ).collect()
    from urllib.parse import urlsplit

    for r in rows:
        assert r["host"] == urlsplit(r["canon_url"]).netloc
        assert bytes(r["uh"]) == url_hash(r["canon_url"])

    hosts = [r["host"] for r in rows]
    hdf = spark.createDataFrame([(h,) for h in hosts], ["host"])
    hrows = hdf.select(
        "host",
        host_hash_expr("host").alias("hh"),
        pk_expr(host_hash_expr("host"), 256).alias("pk"),
    ).collect()
    for r in hrows:
        assert r["hh"] == xxhash64(r["host"])
        assert r["pk"] == pk_of_host_hash(xxhash64(r["host"]), 256)


def test_canonicalize_udf_matches_kernel(spark):
    raw = [
        "HTTPS://H1.EXAMPLE.ORG:443/./p/123%7e#frag",
        "http://a.com",
        "ftp://x.com/a",
        None,
        "https://a.com/%41%2F?",
        "  https://a.com/a//b/./c/.. ",
    ]
    df = spark.createDataFrame([(u,) for u in raw], "url string")
    rows = df.select("url", canonicalize_udf("url").alias("c")).collect()
    for r in rows:
        assert r["c"] == canonicalize_url(r["url"])
