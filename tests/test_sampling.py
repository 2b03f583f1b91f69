"""Deterministic stratified sampling (operators/sampling.py): exact Python
md5 oracle, stability properties, and the sampled derived product. The
driver query `hash_sample` pins the Spark↔DuckDB dialect."""

from __future__ import annotations

import hashlib

import pytest

from indigo_crawler_spark.operators.sampling import (
    TWO32,
    keep_expr,
    sample_corpus,
    threshold,
)


def py_draw(key, salt=""):
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


def py_keep(key, rate, salt=""):
    return py_draw(key, salt) < threshold(rate)


class TestKeepExpr:
    def test_matches_python_oracle(self, spark):
        df = spark.createDataFrame([(k,) for k in range(300)], "k long")
        got = {
            r["k"] for r in df.where(keep_expr("k", 0.4, salt="x")).collect()
        }
        want = {k for k in range(300) if py_keep(k, 0.4, "x")}
        assert got == want
        assert 0 < len(got) < 300

    def test_stratified_rates(self, spark):
        rows = [(k, ["en", "de", "zh"][k % 3]) for k in range(300)]
        df = spark.createDataFrame(rows, "k long, lang string")
        rates = {"en": 0.9, "zh": 0.1}
        got = {
            r["k"]
            for r in df.where(
                keep_expr("k", 0.5, by="lang", rates=rates)
            ).collect()
        }
        want = {
            k
            for k, lang in rows
            if py_draw(k) < threshold(rates.get(lang, 0.5))
        }
        assert got == want

    def test_salt_redraws_independently(self, spark):
        df = spark.createDataFrame([(k,) for k in range(300)], "k long")
        a = {r["k"] for r in df.where(keep_expr("k", 0.5, salt="a")).collect()}
        b = {r["k"] for r in df.where(keep_expr("k", 0.5, salt="b")).collect()}
        a2 = {r["k"] for r in df.where(keep_expr("k", 0.5, salt="a")).collect()}
        assert a == a2  # same salt: identical
        assert a != b  # different salt: a different sample
        # both still near the rate
        assert 0.3 < len(a) / 300 < 0.7 and 0.3 < len(b) / 300 < 0.7

    def test_fate_independent_of_other_rows(self, spark):
        small = spark.createDataFrame([(k,) for k in range(50)], "k long")
        big = spark.createDataFrame(
            [(k,) for k in range(500)], "k long"
        ).repartition(7)
        ks = keep_expr("k", 0.5)
        a = {r["k"] for r in small.where(ks).collect()}
        b = {r["k"] for r in big.where(ks).collect()}
        assert a == {k for k in b if k < 50}

    def test_rate_bounds(self):
        with pytest.raises(ValueError, match="rate"):
            threshold(1.5)
        with pytest.raises(ValueError, match="rate"):
            threshold(-0.1)
        assert threshold(0.0) == 0 and threshold(1.0) == TWO32


def test_sample_corpus_product(spark, tmp_path):
    from indigo_crawler_spark.plans.export import _write_export_manifest

    rows = [
        (f"https://h{i % 4}.example.org/p{i}", f"h{i % 4}.example.org", 0,
         f"text number {i}", i % 4, ["en", "de"][i % 2])
        for i in range(80)
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows,
        "canon_url string, host string, fetch_round int, text string,"
        " pk int, langid string",
    ).repartition("pk").write.partitionBy("pk").parquet(src)
    _write_export_manifest(
        src, {"through_round": 0, "num_buckets": 16, "rows": len(rows)}
    )

    out = str(tmp_path / "sampled")
    rates = {"en": 0.9, "de": 0.2}
    rep = sample_corpus(
        spark, src, out, rate=0.5, by="langid", rates=rates, salt="mix"
    )
    want = {
        u
        for u, _, _, _, _, lang in rows
        if py_draw(u, "mix") < threshold(rates[lang])
    }
    got = {r["canon_url"] for r in spark.read.parquet(out).collect()}
    assert got == want
    assert rep["rows_in"] == 80 and rep["rows_out"] == len(want)
    for lang in ("en", "de"):
        s = rep["by_stratum"][lang]
        assert s["rows_in"] == 40
        assert s["rows_out"] == sum(
            1 for u, *_, lg in rows if lg == lang and u in want
        )

    # columns untouched (sampling selects rows, never rewrites)
    assert set(spark.read.parquet(out).columns) >= {
        "canon_url", "text", "langid"
    }

    # refusals: corpus extension; unknown stratum column
    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans.export import export_corpus
    from indigo_crawler_spark.plans.round import CrawlState
    from indigo_crawler_spark.sources.table_io import TableIO

    state = CrawlState(
        io=TableIO(spark, str(tmp_path / "nostate")), cfg=CrawlConfig()
    )
    with pytest.raises(RuntimeError, match="SAMPLED"):
        export_corpus(state, out)
    with pytest.raises(RuntimeError, match="stratum column"):
        sample_corpus(spark, src, str(tmp_path / "x"), rate=0.5,
                      by="nope", rates={"a": 1.0})
