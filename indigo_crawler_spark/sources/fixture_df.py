"""Fixture rows (fixtures/gen.py, pure Python) → Spark DataFrames with the
explicit production schemas. Small sizes only (tests); bench sizes are
generated distributed in bench.py via spark.range + mapInPandas."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from indigo_crawler_spark.plans import schemas


def pages_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows]
    return spark.createDataFrame(data, schemas.PAGES)


def seeds_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame([(r["url"], r["seed_rank"]) for r in rows], schemas.SEEDS)


def robots_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [(r["host"], r["host_hash"], r["robots_txt"], r["fetched_ts"]) for r in rows]
    return spark.createDataFrame(data, schemas.ROBOTS)


def budgets_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    data = [
        (r["host"], r["host_hash"], r["budget"], r["backoff_until_round"]) for r in rows
    ]
    return spark.createDataFrame(data, schemas.HOST_BUDGETS)
