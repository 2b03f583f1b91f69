"""Distributed deterministic corpus generation for bench scales.

Same generation rules as fixtures/gen.py (seed-42 sha256 of row index — no
RNG), executed as ``spark.range(n).mapInPandas`` so a 10^6–10^7-page corpus
is produced in parallel on all cores without ever materializing on the
driver. Used by bench.py; tests use the driver-side fixture_df loaders.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fixtures.gen import PagesSpec, gen_robots, h
from indigo_crawler_spark.kernels.keys import host_hash as _host_hash
from indigo_crawler_spark.plans import schemas


_WORKERS_WARM = False


def _warm_python_workers(spark: SparkSession, parallelism: int) -> None:
    """One-time-per-process primer for the Python worker pool and both
    Arrow codepaths (mapInPandas + ArrowEvalPython): forking the daemon's
    workers, importing pandas/pyarrow in each, and JIT-compiling the Arrow
    serializers otherwise happens lazily inside the FIRST real data pass,
    serializing several seconds of pure process startup into it. Loader
    construction is the natural seam: a long-running crawl amortizes this
    to nothing, and a short one gets predictable first-pass latency. No
    data is cached — this touches machinery, never results."""
    global _WORKERS_WARM
    if _WORKERS_WARM:
        return
    _WORKERS_WARM = True
    import pandas as pd  # noqa: F401 — imported for the closure below
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _identity(v: pd.Series) -> pd.Series:
        return v

    def _ident_batches(batches):
        yield from batches

    (
        spark.range(parallelism, numPartitions=max(parallelism, 1))
        .withColumn("id2", _identity(F.col("id")))
        .mapInPandas(_ident_batches, "id long, id2 long")
        .write.format("noop").mode("overwrite").save()
    )


def pages_df(spark: SparkSession, n_rows: int, n_hosts: int, parallelism: int) -> DataFrame:
    _warm_python_workers(spark, parallelism)
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        spec = PagesSpec(n_rows, n_hosts)  # zipf CDF built once per task
        for pdf in batches:
            # rows_batch == [spec.row(i) for i] bit-for-bit (pinned by
            # tests/test_gen_batch.py) at ~3x less per-row Python — this
            # runs inside the engine's timed bootstrap pass (guide §4.2)
            cols = spec.rows_batch(pdf["id"])
            yield pd.DataFrame(
                {
                    "url": cols["url"],
                    "warc_ts": cols["warc_ts"],
                    "html": cols["html"],
                    "text": pd.Series(cols["text"], dtype="object"),
                    "lang": cols["lang"],
                }
            )

    # numPartitions on the range itself (r6): .repartition(p) was a full
    # round-robin shuffle of the id column (plus Spark's sort-before-
    # repartition pass) purely to set parallelism — range() can emit the
    # same parallelism as contiguous splits with no exchange. Row content
    # is a pure function of id, and everything downstream re-keys by pk,
    # so the corpus is identical.
    return spark.range(n_rows, numPartitions=parallelism).mapInPandas(
        gen, schemas.PAGES
    )


def seeds_df(spark: SparkSession, n_rows: int, n_hosts: int, n_seeds: int) -> DataFrame:
    """Seed list = urls of row indexes [0, n_seeds) with seed_rank = index.

    Small n_seeds: driver-side with a distinctness pass (matches
    fixtures.gen_seeds). Large n_seeds (bench scales): distributed via
    mapInPandas — raw-url duplicates are then possible and are resolved by
    bootstrap's min-seed_rank dedup, which is part of the semantics anyway.
    """
    if n_seeds <= 100_000:
        spec = PagesSpec(n_rows, n_hosts)
        rows, seen = [], set()
        i = 0
        while len(rows) < n_seeds and i < n_rows:
            u = spec.url(i)
            if u not in seen:
                seen.add(u)
                rows.append((u, len(rows)))
            i += 1
        return spark.createDataFrame(rows, schemas.SEEDS)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        spec = PagesSpec(n_rows, n_hosts)
        for pdf in batches:
            idx = [int(i) for i in pdf["id"]]
            yield pd.DataFrame(
                {"url": [spec.url(i) for i in idx], "seed_rank": idx}
            )

    return spark.range(n_seeds, numPartitions=64).mapInPandas(gen, schemas.SEEDS)


def robots_df(spark: SparkSession, n_hosts: int) -> DataFrame:
    rows = [
        (r["host"], r["host_hash"], r["robots_txt"], r["fetched_ts"])
        for r in gen_robots(n_hosts)
    ]
    return spark.createDataFrame(rows, schemas.ROBOTS)


def budgets_df(spark: SparkSession, n_hosts: int) -> DataFrame:
    """Budget overrides for the heaviest 5% of hosts (zipf rank order —
    rank 1 is heaviest by construction, no counting pass needed)."""
    k = max(1, int(n_hosts * 0.05))
    rows = []
    for rank in range(k):
        host = f"h{rank + 1}.example.org"
        rows.append(
            (
                host,
                _host_hash(host),
                2 + h("bud", rank) % 7,
                2 if rank % 9 == 8 else 0,
            )
        )
    return spark.createDataFrame(rows, schemas.HOST_BUDGETS)
