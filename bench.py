"""Headline benchmark — prints ONE JSON line for the driver.

Two parts:
  A. The flagship crawl loop at web-scale shape: a deterministically
     generated Common-Crawl-style corpus (zipf-skewed hosts, BASELINE.json
     input_hint schema), bootstrap + N scheduler rounds. Headline number:
     URLs scheduled+deduped per second (BASELINE.json metric).
  B. TPC-H-ish operator analogs at $SPARK_GRAFT_SF_DIR (default sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32) — local[N]
  BENCH_PAGES          (default 200000) corpus rows
  BENCH_HOSTS          (default 5000)
  BENCH_SEEDS          (default 2000)
  BENCH_ROUNDS         (default 3)
  BENCH_LH_ROUNDS      (default 24; 0 skips) long-horizon flatness rounds
  BENCH_LH_PAGES       (default 30000) long-horizon corpus rows

Scaling-efficiency evidence (north rule: N vs 4N executors ≥0.8):
``python tools/bench_scaling.py`` runs this same crawl at local[1] and
local[4] (N and 4N task slots, both uncontended) and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def scratch_dir() -> str:
    """Shuffle/state scratch: tmpfs when available (shuffle spill to spinning
    storage is a non-scaling bottleneck; production clusters put shuffle on
    NVMe/ramdisk), else the OS default."""
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def build_spark(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("indigo-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.local.dir", os.path.join(scratch_dir(), "spark-local"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )


def bench_crawl(spark: SparkSession, cpus: int) -> dict:
    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans import schemas
    from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_round
    from indigo_crawler_spark.sources import synthetic
    from indigo_crawler_spark.sources.table_io import TableIO

    n_rows = int(os.environ.get("BENCH_PAGES", "200000"))
    n_hosts = int(os.environ.get("BENCH_HOSTS", "5000"))
    n_seeds = int(os.environ.get("BENCH_SEEDS", "2000"))
    n_rounds = int(os.environ.get("BENCH_ROUNDS", "3"))

    # bloom_bucket_capacity stays at the default None: the engine now sizes
    # the filter itself at bootstrap from the A3 approx_count_distinct
    # estimate riding the store write (4x headroom), persisted in the
    # bootstrap manifest — the round-2 hand-tuned cap (a 1M default burned
    # ~8s/round OR-merging 115MB bitmaps for a 200k corpus) is obsolete.
    cfg = CrawlConfig(round_limit=100_000, num_buckets=64)
    root = tempfile.mkdtemp(prefix="indigo_bench_", dir=scratch_dir())
    state = CrawlState(io=TableIO(spark, root), cfg=cfg)
    timings: dict[str, float] = {}
    round_timings: dict[str, float] = {}
    # per-phase attribution (VERDICT r2: the ~20s/round floor was previously
    # unattributable): run_round returns its ROUND_TIMINGS dict when enabled
    os.environ["SPARK_GRAFT_TIMINGS"] = "1"
    try:
        pages = synthetic.pages_df(spark, n_rows, n_hosts, parallelism=cpus * 2)
        seeds = synthetic.seeds_df(spark, n_rows, n_hosts, n_seeds)
        robots = synthetic.robots_df(spark, n_hosts)
        budgets = synthetic.budgets_df(spark, n_hosts)

        t0 = time.time()
        bpayload = bootstrap(spark, pages, seeds, robots, budgets, state, with_counters=False)
        timings["crawl_bootstrap"] = round(time.time() - t0, 3)
        for phase, sec in (bpayload.get("timings") or {}).items():
            round_timings[f"bootstrap_{phase}"] = sec

        scheduled = 0
        t_rounds = 0.0
        for r in range(n_rounds):
            t0 = time.time()
            payload = run_round(spark, state, r, with_counters=False)
            dt = time.time() - t0
            timings[f"crawl_round{r}"] = round(dt, 3)
            t_rounds += dt
            for phase, sec in (payload.get("timings") or {}).items():
                round_timings[phase] = round(round_timings.get(phase, 0.0) + sec, 3)
            scheduled += state.io.read(
                f"fetch_batches/round={r}", schemas.FETCH_BATCHES
            ).count()

        return {
            "timings": timings,
            "round_timings": round_timings,
            "urls_scheduled": scheduled,
            "rounds_sec": round(t_rounds, 3),
            "urls_scheduled_per_sec": round(scheduled / t_rounds, 1) if t_rounds else 0.0,
            "corpus_rows": n_rows,
        }
    finally:
        os.environ.pop("SPARK_GRAFT_TIMINGS", None)
        shutil.rmtree(root, ignore_errors=True)


def bench_long_horizon(spark: SparkSession, cpus: int) -> dict:
    """Per-round flatness over a LONG horizon (VERDICT r3 missing #1): the
    3-round headline never executes seen compaction or a deep bloom-fold /
    budget-version chain, so nothing timed ever proved that round 20 costs
    what round 4 costs. This runs a small corpus for 24 rounds with
    compaction every 8 and reports the per-round wall series plus the
    last-8/first-8 median ratio — flat means the chain-length-dependent
    costs (seen read, filter fold, budget versioning) are genuinely O(1)
    per round. The closed-loop backoff is ON so host_budgets/round=R tables
    accumulate, as they would in production.

    Env knobs: BENCH_LH_ROUNDS (default 24), BENCH_LH_PAGES (default 30000).
    Set BENCH_LH_ROUNDS=0 to skip.
    """
    import statistics

    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_round
    from indigo_crawler_spark.sources import synthetic
    from indigo_crawler_spark.sources.table_io import TableIO

    n_rounds = int(os.environ.get("BENCH_LH_ROUNDS", "24"))
    if not n_rounds:
        return {}
    n_rows = int(os.environ.get("BENCH_LH_PAGES", "30000"))
    n_hosts, n_seeds = 1500, 600
    # round_limit small relative to the corpus so the frontier stays deep and
    # every round does real scheduling work through round 24
    cfg = CrawlConfig(
        round_limit=500,
        num_buckets=32,
        seen_compact_every=8,
        ban_every=97,
        backoff_rounds=2,
    )
    root = tempfile.mkdtemp(prefix="indigo_lh_", dir=scratch_dir())
    state = CrawlState(io=TableIO(spark, root), cfg=cfg)
    try:
        pages = synthetic.pages_df(spark, n_rows, n_hosts, parallelism=cpus * 2)
        seeds = synthetic.seeds_df(spark, n_rows, n_hosts, n_seeds)
        robots = synthetic.robots_df(spark, n_hosts)
        budgets = synthetic.budgets_df(spark, n_hosts)
        bootstrap(spark, pages, seeds, robots, budgets, state, with_counters=False)
        walls, emitted = [], 0
        for r in range(n_rounds):
            t0 = time.time()
            payload = run_round(spark, state, r, with_counters=False)
            walls.append(round(time.time() - t0, 3))
            emitted += payload["counters"]["emitted"]
        first8 = statistics.median(walls[:8])
        last8 = statistics.median(walls[-8:])
        return {
            "rounds": n_rounds,
            "corpus_rows": n_rows,
            "urls_scheduled": emitted,
            "round_walls": walls,
            "first8_median": round(first8, 3),
            "last8_median": round(last8, 3),
            "flatness_ratio": round(last8 / first8, 3) if first8 else None,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_queries(spark: SparkSession, sf_dir: str, reps: int = 3) -> dict:
    """Median of *reps* timed runs per operator analog — a single sample on
    this ±2x-noise VM cannot distinguish a regression from jitter (VERDICT
    r2). First run per name additionally pays JVM/codegen warmup; the median
    absorbs it."""
    import statistics

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [
        "join_agg",
        "window_topk_per_customer",
        "group_agg",
        "explode_tokens",
        "anti_join",
        "global_topk",
    ]
    out = {}
    for name in names:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            samples.append(time.time() - t0)
        out[name] = round(statistics.median(samples), 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    t_all = time.time()

    reps = int(os.environ.get("BENCH_REPS", "3"))
    crawl = bench_crawl(spark, cpus)
    queries = dict(crawl["timings"])
    queries.update(bench_queries(spark, sf_dir, reps=reps))

    # headline total = crawl + operator analogs, the series comparable to
    # earlier rounds; the long-horizon flatness run is timed separately
    total = round(time.time() - t_all, 3)
    long_horizon = bench_long_horizon(spark, cpus)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    print(
        json.dumps(
            {
                "metric": "crawl_scheduler_bench_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "reps": reps,
                "round_timings": crawl["round_timings"],
                "urls_scheduled": crawl["urls_scheduled"],
                "urls_scheduled_per_sec": crawl["urls_scheduled_per_sec"],
                "corpus_rows": crawl["corpus_rows"],
                "long_horizon": long_horizon,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
