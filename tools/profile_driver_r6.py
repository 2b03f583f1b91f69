"""Driver-side Python profile of one crawl (bootstrap + 3 rounds): where the
MAIN THREAD's Python time goes — py4j round-trips vs plan construction vs
waiting on jobs. Guide §1 measurement probe; not part of the driver bench.

Usage: python tools/profile_driver_r6.py [rounds]
Prints the top cumulative-time entries twice: full (including job waits via
socket recv) and construction-only (py4j send/recv excluded heuristically by
looking at the non-wait frames).
"""

from __future__ import annotations

import cProfile
import os
import pstats
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile-driver-r6")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_round
    from indigo_crawler_spark.sources import synthetic
    from indigo_crawler_spark.sources.table_io import TableIO

    spark.range(1000).select(F.sum("id")).collect()

    n_rows = int(os.environ.get("PROBE_PAGES", "200000"))
    n_hosts = int(os.environ.get("PROBE_HOSTS", "5000"))
    pages = synthetic.pages_df(spark, n_rows, n_hosts, parallelism=cpus * 2)
    seeds = synthetic.seeds_df(spark, n_rows, n_hosts, 2000)
    robots = synthetic.robots_df(spark, n_hosts)
    budgets = synthetic.budgets_df(spark, n_hosts)

    cfg = CrawlConfig(round_limit=1000, num_buckets=64)
    root = tempfile.mkdtemp(prefix="profdrv_", dir="/dev/shm")
    state = CrawlState(io=TableIO(spark, root), cfg=cfg)

    # warm pass: bootstrap + one full round so every lazy import/JIT is done
    bootstrap(spark, pages, seeds, robots, budgets, state, with_counters=False)
    run_round(spark, state, 0, with_counters=False)

    # profiled pass: fresh state dir, same shapes
    shutil.rmtree(root, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="profdrv_", dir="/dev/shm")
    state = CrawlState(io=TableIO(spark, root), cfg=cfg)

    prof = cProfile.Profile()
    t0 = time.time()
    prof.enable()
    bootstrap(spark, pages, seeds, robots, budgets, state, with_counters=False)
    for r in range(rounds):
        run_round(spark, state, r, with_counters=False)
    prof.disable()
    wall = time.time() - t0
    print(f"profiled wall: {wall:.2f}s (bootstrap + {rounds} rounds)")

    st = pstats.Stats(prof)
    print("\n==== top 40 by cumulative ====")
    st.sort_stats("cumulative").print_stats(40)
    print("\n==== top 40 by tottime (self) ====")
    st.sort_stats("tottime").print_stats(40)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
