"""T1 — A4/A5 partitioned-Bloom DataFrame operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from indigo_crawler_spark.functions.keys import url_hash_expr
from indigo_crawler_spark.operators.bloom_ops import (
    bloom_geometry,
    build_bloom_delta,
    merge_blooms,
    probe_split,
)


def _keyed(spark, urls, pks):
    df = spark.createDataFrame(list(zip(urls, pks)), "canon_url string, pk int")
    return df.withColumn("url_hash", url_hash_expr("canon_url")).withColumn(
        "first_round", F.lit(0)
    )


def test_probe_no_false_negatives_and_split(spark):
    members = [f"https://m{i}.com/x" for i in range(50)]
    others = [f"https://o{i}.org/y" for i in range(50)]
    seen = _keyed(spark, members, [i % 4 for i in range(50)])
    nbits, k = bloom_geometry(64, 1e-3)
    blooms = build_bloom_delta(seen, nbits, k)
    assert blooms.count() == 4

    cand = _keyed(spark, members + others, [i % 4 for i in range(100)]).drop(
        "first_round"
    )
    new, maybe = probe_split(cand, blooms)
    new_urls = {r["canon_url"] for r in new.collect()}
    maybe_urls = {r["canon_url"] for r in maybe.collect()}
    # partition property: every candidate lands in exactly one side
    assert new_urls | maybe_urls == set(members + others)
    assert not (new_urls & maybe_urls)
    # no false negatives: every member is flagged maybe_seen
    assert set(members) <= maybe_urls


def test_probe_unseen_bucket_all_new(spark):
    seen = _keyed(spark, ["https://m.com/x"], [0])
    nbits, k = bloom_geometry(64, 1e-3)
    blooms = build_bloom_delta(seen, nbits, k)
    cand = _keyed(spark, ["https://q.com/z"], [3]).drop("first_round")  # bucket 3 empty
    new, maybe = probe_split(cand, blooms)
    assert new.count() == 1 and maybe.count() == 0


def test_merge_is_union(spark):
    a = _keyed(spark, [f"https://a{i}.com/" for i in range(20)], [i % 2 for i in range(20)])
    b = _keyed(spark, [f"https://b{i}.com/" for i in range(20)], [i % 2 for i in range(20)])
    nbits, k = bloom_geometry(64, 1e-3)
    merged = merge_blooms(build_bloom_delta(a, nbits, k), build_bloom_delta(b, nbits, k))
    cand = a.unionByName(b).drop("first_round")
    new, maybe = probe_split(cand, merged)
    assert new.count() == 0 and maybe.count() == 40
