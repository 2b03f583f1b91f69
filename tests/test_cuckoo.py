"""T0/T1 — cuckoo filter kernel + DataFrame ops (deletable seen-set)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from indigo_crawler_spark.kernels.bloom import digests_to_array
from indigo_crawler_spark.kernels.cuckoo import CuckooFilter
from indigo_crawler_spark.kernels.keys import url_hash


def _digs(urls):
    return digests_to_array([url_hash(u) for u in urls])


class TestKernel:
    def test_insert_contains_no_false_negatives(self):
        cf = CuckooFilter.for_capacity(2000)
        members = _digs([f"https://m{i}.com/{i}" for i in range(1500)])
        ok = cf.insert_many(members)
        assert ok.all()
        assert cf.contains_many(members).all()

    def test_fpr_low(self):
        cf = CuckooFilter.for_capacity(2000)
        cf.insert_many(_digs([f"https://m{i}.com/{i}" for i in range(1500)]))
        others = _digs([f"https://o{i}.org/{i}" for i in range(5000)])
        assert cf.contains_many(others).mean() < 0.01

    def test_delete_restores_negatives(self):
        cf = CuckooFilter.for_capacity(256)
        urls = [f"https://d{i}.com/x" for i in range(100)]
        cf.insert_many(_digs(urls))
        removed = cf.delete_many(_digs(urls[:50]))
        assert removed.all()
        assert not cf.contains_many(_digs(urls[:50])).any()  # fully gone
        assert cf.contains_many(_digs(urls[50:])).all()  # others intact

    def test_merge_and_serde(self):
        a, b = CuckooFilter.for_capacity(512), CuckooFilter.for_capacity(512)
        ua = [f"https://a{i}.com/" for i in range(200)]
        ub = [f"https://b{i}.com/" for i in range(200)]
        a.insert_many(_digs(ua))
        b.insert_many(_digs(ub))
        rt = CuckooFilter.from_bytes(a.to_bytes(), a.nbuckets)
        assert rt.merge_from(b) == 0
        assert rt.contains_many(_digs(ua + ub)).all()

    def test_deterministic(self):
        u = [f"https://z{i}.com/{i}" for i in range(300)]
        t1 = CuckooFilter.for_capacity(512)
        t2 = CuckooFilter.for_capacity(512)
        t1.insert_many(_digs(u))
        t2.insert_many(_digs(u))
        assert (t1.table == t2.table).all()


class TestOps:
    def test_build_probe_delete_roundtrip(self, spark):
        from indigo_crawler_spark.functions.keys import url_hash_expr
        from indigo_crawler_spark.operators.cuckoo_ops import (
            build_cuckoo_delta,
            cuckoo_geometry,
            delete_from_cuckoo,
            probe_split_cuckoo,
        )

        urls = [f"https://m{i}.com/x" for i in range(40)]
        seen = (
            spark.createDataFrame([(u, i % 4) for i, u in enumerate(urls)], "canon_url string, pk int")
            .withColumn("url_hash", url_hash_expr("canon_url"))
            .withColumn("first_round", F.lit(0))
        )
        nb, _ = cuckoo_geometry(64)
        filters = build_cuckoo_delta(seen, nb)

        cand = seen.drop("first_round")
        new, maybe = probe_split_cuckoo(cand, filters)
        assert new.count() == 0 and maybe.count() == 40  # all members flagged

        retired = seen.where(F.col("pk") == 1)
        n_retired = retired.count()
        filters2 = delete_from_cuckoo(filters, retired)
        new2, maybe2 = probe_split_cuckoo(cand, filters2)
        assert new2.count() == n_retired  # retired urls now certainly-new
        assert maybe2.count() == 40 - n_retired

    def test_delete_exactness_behind_driver_query(self, spark):
        """The driver's cuckoo_delete_probe query gained an exact anti-join
        backstop (production pattern), which makes its oracle check blind to
        a delete_from_cuckoo that silently deletes nothing (ADVICE r3).
        This pins deletion exactness at the same dataset/shape the driver
        uses: after deleting `gone`, (a) deleted keys still probing positive
        must SHRINK to a small collision residue (a no-op delete keeps all
        of them positive), and (b) no surviving key may go negative."""
        from indigo_crawler_spark.functions.keys import url_hash_expr
        from indigo_crawler_spark.operators.cuckoo_ops import (
            build_cuckoo_delta,
            cuckoo_geometry,
            delete_from_cuckoo,
            probe_split_cuckoo,
        )

        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        keys = (
            orders.select(F.col("o_custkey").cast("string").alias("key"))
            .distinct()
            .withColumn("url_hash", url_hash_expr(F.col("key")))
            .withColumn("pk", F.pmod(F.xxhash64("key"), F.lit(8)))
        )
        nbuckets, _ = cuckoo_geometry(4096)
        filters = build_cuckoo_delta(keys, nbuckets)
        gone = keys.join(
            orders.where(F.col("o_orderstatus") == "F")
            .select(F.col("o_custkey").cast("string").alias("key"))
            .distinct(),
            on="key",
            how="left_semi",
        )
        n_gone = gone.count()
        assert n_gone > 50  # the probe below must be a real sample
        _, still = probe_split_cuckoo(keys, delete_from_cuckoo(filters, gone))
        survivors = keys.join(gone, on="key", how="left_anti")
        # (a) deletes took effect: at most a small fingerprint-collision
        # residue of the deleted keys may still probe positive
        gone_still = still.join(gone, on="key", how="left_semi").count()
        assert gone_still <= max(2, n_gone // 20), (
            f"{gone_still}/{n_gone} deleted keys still probe positive — "
            "delete_from_cuckoo is not actually deleting"
        )
        # (b) no false negatives introduced on survivors
        n_surv = survivors.count()
        assert still.join(survivors, on="key", how="left_semi").count() == n_surv
