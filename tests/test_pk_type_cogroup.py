"""Regression: cogrouping candidates against the membership filter must
pair groups even when the caller's pk column is bigint (SEEN_BLOOM.pk is
int). Before the _pk_int coercion, the two sides hash-partitioned by
DIFFERENT key bytes, splitting every (candidates, filter) pair into two
half-empty groups — silent false negatives, masked by AQE's partition
coalescing and exposed the moment AQE is off."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("pk-type-cogroup")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # AQE OFF is the exposing configuration — do not remove
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )
    yield s


def _keys(spark, pk_type: str):
    from indigo_crawler_spark.functions.keys import url_hash_expr

    return (
        spark.range(200)
        .select(F.col("id").cast("string").alias("key"))
        .withColumn("url_hash", url_hash_expr(F.col("key")))
        .withColumn("pk", F.pmod(F.xxhash64("key"), F.lit(8)).cast(pk_type))
    )


def test_bloom_probe_pairs_groups_with_bigint_pk(spark):
    from indigo_crawler_spark.operators.bloom_ops import (
        bloom_geometry,
        build_bloom_delta,
        probe_split,
    )

    keys = _keys(spark, "bigint")
    nbits, k = bloom_geometry(4096, 1e-3)
    filters = build_bloom_delta(keys, nbits, k)
    certainly_new, maybe = probe_split(keys, filters)
    # no false negatives: every inserted key must probe present
    assert certainly_new.count() == 0
    assert maybe.count() == 200


def test_cuckoo_probe_and_delete_with_bigint_pk(spark):
    from indigo_crawler_spark.operators.cuckoo_ops import (
        build_cuckoo_delta,
        cuckoo_geometry,
        delete_from_cuckoo,
        probe_split_cuckoo,
    )

    keys = _keys(spark, "bigint")
    nbuckets, _ = cuckoo_geometry(4096)
    filters = build_cuckoo_delta(keys, nbuckets)
    certainly_new, maybe = probe_split_cuckoo(keys, filters)
    assert certainly_new.count() == 0
    assert maybe.count() == 200
    gone = keys.where(F.col("key").cast("int") < 50)
    deleted = delete_from_cuckoo(filters, gone)
    _, still = probe_split_cuckoo(keys, deleted)
    # deletions are exact for cuckoo: the 150 survivors stay present
    assert still.count() == 150
