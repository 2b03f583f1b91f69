"""Text normalization (kernels/textnorm.py, normalize_text_udf,
normalize_corpus): kernel battery, UDF fidelity, DuckDB-chain equivalence,
and the normalized derived product. Driver query `text_normalize` pins the
cross-engine parity on the full synthetic corpus."""

from __future__ import annotations

import duckdb
import pytest

from indigo_crawler_spark.kernels.textnorm import normalize_text

_DUCK_CHAIN = (
    "nfc_normalize(regexp_replace(regexp_replace("
    "replace(replace(t, chr(13) || chr(10), chr(10)), chr(13), chr(10)),"
    " '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g'),"
    " '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'))"
)

CASES = [
    ("plain ascii stays", "plain ascii stays"),
    ("a\r\nb\rc", "a\nb\nc"),                      # CRLF and CR fold to LF
    ("keep\tthis\nstructure", "keep\tthis\nstructure"),
    ("bell\x07gone \x1b[0m too", "bellgone [0m too"),  # C0 controls drop
    ("del\x7fgone", "delgone"),
    ("zero\u200bwidth\u200cgone\u200d!\ufeff", "zerowidthgone!"),
    ("cafe\u0301", "caf\u00e9"),                   # NFC composes
    ("already \u00e9", "already \u00e9"),          # NFC idempotent
    ("", ""),
]


class TestKernel:
    def test_battery(self):
        for raw, want in CASES:
            assert normalize_text(raw) == want, repr(raw)

    def test_idempotent(self):
        for raw, _ in CASES:
            once = normalize_text(raw)
            assert normalize_text(once) == once, repr(raw)

    def test_duckdb_chain_equivalent(self):
        # the declarative oracle chain IS the kernel, engine-for-engine —
        # the property the text_normalize driver query relies on
        con = duckdb.connect()
        for raw, _ in CASES:
            got = con.execute(
                f"SELECT {_DUCK_CHAIN} FROM (SELECT ? AS t)", [raw]
            ).fetchone()[0]
            assert got == normalize_text(raw), repr(raw)


class TestSparkSide:
    def test_udf_matches_kernel(self, spark):
        from pyspark.sql import functions as F

        from indigo_crawler_spark.functions.udfs import normalize_text_udf

        df = spark.createDataFrame(
            [(i, raw) for i, (raw, _) in enumerate(CASES)] + [(99, None)],
            "i long, t string",
        )
        got = {
            r["i"]: r["n"]
            for r in df.select("i", normalize_text_udf("t").alias("n")).collect()
        }
        for i, (_, want) in enumerate(CASES):
            assert got[i] == want, i
        assert got[99] is None

    def test_normalize_corpus_product(self, spark, tmp_path):
        from indigo_crawler_spark.plans.export import (
            _write_export_manifest,
            normalize_corpus,
        )

        rows = [
            ("https://a.example.org/1", "a.example.org", 0, "café menu", 3),
            ("https://b.example.org/2", "b.example.org", 0, "clean text", 7),
            ("https://c.example.org/3", "c.example.org", 0, "x\r\ny", 11),
        ]
        src = str(tmp_path / "corpus")
        spark.createDataFrame(
            rows,
            "canon_url string, host string, fetch_round int, text string, pk int",
        ).repartition("pk").write.partitionBy("pk").parquet(src)
        _write_export_manifest(
            src, {"through_round": 0, "num_buckets": 16, "rows": len(rows)}
        )
        out = str(tmp_path / "normalized")
        rep = normalize_corpus(spark, src, out)
        got = {
            r["canon_url"]: r["text"] for r in spark.read.parquet(out).collect()
        }
        assert rep["rows"] == 3 and rep["rows_changed"] == 2
        assert got["https://a.example.org/1"] == "caf\u00e9 menu"
        assert got["https://b.example.org/2"] == "clean text"
        assert got["https://c.example.org/3"] == "x\ny"

        from indigo_crawler_spark.config import CrawlConfig
        from indigo_crawler_spark.plans.export import export_corpus
        from indigo_crawler_spark.plans.round import CrawlState
        from indigo_crawler_spark.sources.table_io import TableIO

        state = CrawlState(
            io=TableIO(spark, str(tmp_path / "nostate")), cfg=CrawlConfig()
        )
        with pytest.raises(RuntimeError, match="NORMALIZED"):
            export_corpus(state, out)
