"""Per-phase scaling attribution for one scheduler round, plus a vanilla-
Spark control — the evidence behind BENCH/BASELINE.md's 2→8 analysis.

Usage:
  python tools/bench_phase_attr.py round <cores>   # one timed round, phase timings
  python tools/bench_phase_attr.py micro <cores>   # pure-Spark window/join control

`round` requires the scaling corpus (tools/bench_scaling.py --keep-corpus)
at /tmp/indigo_scaling_corpus. Run each mode at 2/4/8 in fresh processes and
compare phase ratios: a phase that scales like its underlying vanilla-Spark
primitive (the `micro` numbers) is environment-bound, not engine-bound.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def build(cores: int, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"{app}-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(4 * cores, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", os.path.join(SCRATCH, "spark-local"))
        .config("spark.sql.adaptive.enabled", "false")
        .getOrCreate()
    )


def round_mode(cores: int) -> None:
    os.environ["SPARK_GRAFT_TIMINGS"] = "1"
    spark = build(cores, "attr")
    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans import schemas
    from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_round
    from indigo_crawler_spark.sources.table_io import TableIO

    corpus = "/tmp/indigo_scaling_corpus"
    pages = spark.read.schema(schemas.PAGES).parquet(corpus + "/pages")
    seeds = spark.read.schema(schemas.SEEDS).parquet(corpus + "/seeds")
    robots = spark.read.schema(schemas.ROBOTS).parquet(corpus + "/robots")
    budgets = spark.createDataFrame([], schemas.HOST_BUDGETS)
    cfg = CrawlConfig(round_limit=5_000_000, num_buckets=64, default_budget=1000)
    root = tempfile.mkdtemp(prefix=f"attr_{cores}_", dir=SCRATCH)
    state = CrawlState(io=TableIO(spark, root), cfg=cfg)
    bootstrap(spark, pages, seeds, robots, budgets, state, with_counters=False)
    t0 = time.time()
    p = run_round(spark, state, 0, with_counters=False)
    print(
        f"ROUND cores={cores} wall={time.time() - t0:.1f} "
        f"timings={json.dumps(p['timings'])}"
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def micro_mode(cores: int) -> None:
    spark = build(cores, "micro")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(10).count()  # warm
    df = (
        spark.range(30_000_000, numPartitions=max(4 * cores, 16))
        .withColumn(
            "url",
            F.concat(
                F.lit("https://host"), (F.col("id") % 500000).cast("string"),
                F.lit(".example.com/path/"), F.col("id").cast("string"),
            ),
        )
        .withColumn("host", F.concat(F.lit("host"), (F.col("id") % 500000).cast("string")))
    )
    t0 = time.time()
    w = Window.partitionBy("host").orderBy(F.desc("id"))
    df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 8).count()
    t1 = time.time()
    a = df.select("url", "id")
    b = df.select(F.col("url"), (F.col("id") * 2).alias("v"))
    a.join(b.hint("SHUFFLE_HASH"), "url").count()
    t2 = time.time()
    print(f"MICRO cores={cores} window={t1 - t0:.1f}s join={t2 - t1:.1f}s")
    spark.stop()


if __name__ == "__main__":
    mode, cores = sys.argv[1], int(sys.argv[2])
    (round_mode if mode == "round" else micro_mode)(cores)
