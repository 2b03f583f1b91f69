"""Round-6 optimization probe: isolate where bootstrap_store_write and the
round phases spend time (guide §1.4 noop-sink isolation). Not part of the
driver bench — numbers cited in OPTIMIZATION_r06.md."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.3f}s", flush=True)
    return out


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = int(os.environ.get("PROBE_PAGES", "200000"))
    n_hosts = int(os.environ.get("PROBE_HOSTS", "5000"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-r6")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from indigo_crawler_spark.sources import synthetic

    spark.range(1000).select(F.sum("id")).collect()

    for rep in (1, 2):
        pages = synthetic.pages_df(spark, n_rows, n_hosts, parallelism=cpus * 2)
        # A. pure generation cost (noop sink)
        t(f"rep{rep} gen_pages_noop", lambda: pages.write.format("noop").mode("overwrite").save())
        # B. generation + canonicalize UDF
        from indigo_crawler_spark.functions.udfs import make_canonicalize_udf

        canon = pages.withColumn("canon_url", make_canonicalize_udf()(F.col("url")))
        t(f"rep{rep} gen+canon_noop", lambda: canon.write.format("noop").mode("overwrite").save())
        # C. full store pipeline to a real write
        import shutil
        import tempfile

        from indigo_crawler_spark.config import CrawlConfig
        from indigo_crawler_spark.plans.round import CrawlState, bootstrap
        from indigo_crawler_spark.sources.table_io import TableIO

        cfg = CrawlConfig(round_limit=100_000, num_buckets=64)
        root = tempfile.mkdtemp(prefix="probe_r6_", dir="/dev/shm")
        state = CrawlState(io=TableIO(spark, root), cfg=cfg)
        seeds = synthetic.seeds_df(spark, n_rows, n_hosts, 2000)
        robots = synthetic.robots_df(spark, n_hosts)
        budgets = synthetic.budgets_df(spark, n_hosts)
        os.environ["SPARK_GRAFT_TIMINGS"] = "1"
        payload = t(
            f"rep{rep} bootstrap_full",
            lambda: bootstrap(spark, pages, seeds, robots, budgets, state, with_counters=False),
        )
        print(f"rep{rep} bootstrap timings:", payload.get("timings"), flush=True)
        from indigo_crawler_spark.plans.round import run_round

        for r in range(3):
            p = t(f"rep{rep} round{r}", lambda: run_round(spark, state, r, with_counters=False))
            print(f"rep{rep} round{r} timings:", p.get("timings"), flush=True)
        os.environ.pop("SPARK_GRAFT_TIMINGS", None)
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
