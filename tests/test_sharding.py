"""Token-budget shard packing (operators/sharding.py): distributed exclusive
prefix sum vs a sequential Python oracle, boundary semantics, and the
shard-packed derived product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indigo_crawler_spark.operators.sharding import pack_shards, shard_corpus


def python_pack(rows, budget):
    """Sequential oracle: exclusive cumsum // budget in key order."""
    out, acc = {}, 0
    for key, w in sorted(rows):
        out[key] = acc // budget
        acc += w
    return out


class TestPackShards:
    def test_matches_sequential_oracle_across_partitions(self, spark):
        # 400 rows, deterministic pseudo-random weights, forced through many
        # range partitions so the offsets path is actually exercised
        rows = [(f"k{i:04d}", (i * 2654435761) % 97) for i in range(400)]
        df = spark.createDataFrame(rows, "k string, w long").repartition(13)
        packed, cached = pack_shards(
            df, 100, weight_col="w", order_cols=["k"], num_partitions=11
        )
        try:
            got = {r["k"]: r["shard_id"] for r in packed.collect()}
        finally:
            cached.unpersist()
        assert got == python_pack(rows, 100)
        # partition count sanity: the range exchange actually fanned out
        assert cached.rdd.getNumPartitions() > 1

    def test_boundary_semantics(self, spark):
        # budget 10: [4,6] fill shard 0 exactly; 25 (oversized) opens shard 1
        # alone; 0-weight rides shard 3 (excl=35); 1 stays in shard 3
        rows = [("a", 4), ("b", 6), ("c", 25), ("d", 0), ("e", 1)]
        df = spark.createDataFrame(rows, "k string, w long")
        packed, cached = pack_shards(df, 10, weight_col="w", order_cols=["k"])
        try:
            got = {r["k"]: r["shard_id"] for r in packed.collect()}
        finally:
            cached.unpersist()
        assert got == {"a": 0, "b": 0, "c": 1, "d": 3, "e": 3}

    def test_null_weight_rides_current_shard(self, spark):
        df = spark.createDataFrame(
            [("a", 7), ("b", None), ("c", 5)], "k string, w long"
        )
        packed, cached = pack_shards(df, 10, weight_col="w", order_cols=["k"])
        try:
            got = {r["k"]: r["shard_id"] for r in packed.collect()}
        finally:
            cached.unpersist()
        assert got == {"a": 0, "b": 0, "c": 0}

    def test_rejects_nonpositive_budget(self, spark):
        df = spark.createDataFrame([("a", 1)], "k string, w long")
        with pytest.raises(ValueError, match="positive"):
            pack_shards(df, 0, weight_col="w", order_cols=["k"])


class TestShardCorpus:
    @pytest.fixture()
    def corpus(self, spark, tmp_path):
        from indigo_crawler_spark.plans.export import _write_export_manifest

        rows = [
            (f"https://h{i % 5}.example.org/p{i}", f"h{i % 5}.example.org", 0,
             " ".join(f"w{j}" for j in range((i * 7) % 23 + 1)), i % 4)
            for i in range(60)
        ]
        src = str(tmp_path / "corpus")
        spark.createDataFrame(
            rows,
            "canon_url string, host string, fetch_round int, text string, pk int",
        ).repartition("pk").write.partitionBy("pk").parquet(src)
        _write_export_manifest(
            src, {"through_round": 0, "num_buckets": 16, "rows": len(rows)}
        )
        return src, rows

    def test_product_layout_and_determinism(self, spark, tmp_path, corpus):
        import json
        import os

        src, rows = corpus
        out = str(tmp_path / "shards")
        rep = shard_corpus(spark, src, out, shard_tokens=50)
        assert rep["rows"] == len(rows)
        want = python_pack(
            [(u, len(t.split())) for u, _, _, t, _ in rows], 50
        )
        got = {
            r["canon_url"]: r["shard_id"]
            for r in spark.read.option("basePath", out).parquet(
                *(os.path.join(out, d) for d in os.listdir(out)
                  if d.startswith("shard_id="))
            ).collect()
        }
        assert got == want
        assert rep["n_shards"] == max(want.values()) + 1
        assert rep["total_tokens"] == sum(len(t.split()) for _, _, _, t, _ in rows)
        # one parquet dir per shard
        dirs = {d for d in os.listdir(out) if d.startswith("shard_id=")}
        assert dirs == {f"shard_id={s}" for s in set(want.values())}
        with open(os.path.join(out, "_export_manifest.json")) as f:
            m = json.load(f)
        assert m["sharded_from"] == src and m["shard_tokens"] == 50

        # content-addressed order: re-sharding is bit-identical
        out2 = str(tmp_path / "shards2")
        shard_corpus(spark, src, out2, shard_tokens=50)
        got2 = {
            r["canon_url"]: r["shard_id"]
            for r in spark.read.option("basePath", out2).parquet(
                *(os.path.join(out2, d) for d in os.listdir(out2)
                  if d.startswith("shard_id="))
            ).collect()
        }
        assert got2 == got

        # a shard dir is a derived product, not an extendable corpus
        from indigo_crawler_spark.config import CrawlConfig
        from indigo_crawler_spark.plans.export import export_corpus
        from indigo_crawler_spark.plans.round import CrawlState
        from indigo_crawler_spark.sources.table_io import TableIO

        state = CrawlState(
            io=TableIO(spark, str(tmp_path / "nostate")), cfg=CrawlConfig()
        )
        with pytest.raises(RuntimeError, match="SHARD"):
            export_corpus(state, out)
