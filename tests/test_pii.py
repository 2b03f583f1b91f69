"""PII detection/redaction (functions/pii.py) and the redacted corpus
product (plans/export.redact_corpus). The driver queries `pii_counts` /
`pii_redact` pin the Spark↔DuckDB dialect; these tests pin the semantics on
hand-built cases (boundaries, NULLs, order) and the product contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indigo_crawler_spark.functions.pii import (
    PII_ORDER,
    PII_PATTERNS,
    pii_exprs,
    redact_pii,
)

CASES = [
    # (text, {kind: count}, redacted)
    ("mail me at bob.smith+x@sub.example.org now",
     {"email": 1}, "mail me at <EMAIL> now"),
    ("ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1",
     {"ssn": 1, "phone": 1, "ipv4": 1},
     "ssn <SSN> phone <PHONE> ip <IPV4>"),
    ("no pii here at all", {}, "no pii here at all"),
    ("two mails a@b.io c@d.co and 192.168.1.255",
     {"email": 2, "ipv4": 1}, "two mails <EMAIL> <EMAIL> and <IPV4>"),
    # boundaries: digits glued to words do not match ssn/phone
    ("x123-45-6789y", {}, "x123-45-6789y"),
    ("", {}, ""),
]


class TestPiiExprs:
    def test_counts_hand_cases(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, (t, _, _) in enumerate(CASES)], "i long, t string"
        )
        exprs = pii_exprs("t")
        rows = {
            r["i"]: r.asDict()
            for r in df.select("i", *[v.alias(k) for k, v in exprs.items()]).collect()
        }
        for i, (_, want, _) in enumerate(CASES):
            for k in PII_ORDER:
                assert rows[i][f"n_{k}"] == want.get(k, 0), (i, k)
            assert rows[i]["n_pii"] == sum(want.values()), i

    def test_redact_hand_cases(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, (t, _, _) in enumerate(CASES)], "i long, t string"
        )
        got = {
            r["i"]: r["red"]
            for r in df.select("i", redact_pii("t").alias("red")).collect()
        }
        for i, (_, _, want) in enumerate(CASES):
            assert got[i] == want, i

    def test_null_text(self, spark):
        df = spark.createDataFrame([(1, None)], "i long, t string")
        exprs = pii_exprs("t")
        r = df.select(
            *[v.alias(k) for k, v in exprs.items()],
            redact_pii("t").alias("red"),
        ).collect()[0]
        assert r["red"] is None
        assert all(r[f"n_{k}"] is None for k in PII_ORDER)

    def test_patterns_are_re2_safe(self):
        # the DuckDB mirror requires the common Java/RE2 subset: no
        # lookarounds, no backreferences
        for pat in PII_PATTERNS.values():
            assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
            assert "\\1" not in pat


def test_redact_corpus_product(spark, tmp_path):
    import json
    import os

    from indigo_crawler_spark.plans.export import (
        _write_export_manifest,
        redact_corpus,
    )

    rows = [
        ("https://a.example.org/1", "a.example.org", 0,
         "contact alice@corp.example or 10.1.2.3", 3),
        ("https://b.example.org/2", "b.example.org", 0,
         "clean text with no identifiers", 7),
        ("https://c.example.org/3", "c.example.org", 0,
         "call 555-123-4567 ssn 987-65-4321", 11),
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "canon_url string, host string, fetch_round int, text string, pk int"
    ).repartition("pk").write.partitionBy("pk").parquet(src)
    _write_export_manifest(
        src, {"through_round": 0, "num_buckets": 16, "rows": len(rows)}
    )

    out = str(tmp_path / "redacted")
    rep = redact_corpus(spark, src, out)
    assert rep["rows"] == 3
    assert rep["matches_by_kind"] == {
        "email": 1, "ssn": 1, "phone": 1, "ipv4": 1
    }
    got = {r["canon_url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got["https://a.example.org/1"] == "contact <EMAIL> or <IPV4>"
    assert got["https://b.example.org/2"] == "clean text with no identifiers"
    assert got["https://c.example.org/3"] == "call <PHONE> ssn <SSN>"
    with open(os.path.join(out, "_export_manifest.json")) as f:
        assert json.load(f)["redacted_from"] == src

    # refusal as corpus extension target
    from indigo_crawler_spark.config import CrawlConfig
    from indigo_crawler_spark.plans.export import export_corpus
    from indigo_crawler_spark.plans.round import CrawlState
    from indigo_crawler_spark.sources.table_io import TableIO

    state = CrawlState(
        io=TableIO(spark, str(tmp_path / "nostate")), cfg=CrawlConfig()
    )
    with pytest.raises(RuntimeError, match="REDACTED"):
        export_corpus(state, out)


def test_redact_corpus_recomputes_annotations(spark, tmp_path):
    import hashlib

    from indigo_crawler_spark.plans.export import (
        _annotate,
        _write_export_manifest,
        redact_corpus,
    )

    rows = [("https://a.example.org/1", "a.example.org", 0,
             "mail x@y.zz thanks", 3)]
    src = str(tmp_path / "corpus")
    df = spark.createDataFrame(
        rows, "canon_url string, host string, fetch_round int, text string, pk int"
    )
    _annotate(df).repartition("pk").write.partitionBy("pk").parquet(src)
    _write_export_manifest(
        src,
        {"through_round": 0, "num_buckets": 16, "rows": 1, "annotated": True},
    )
    out = str(tmp_path / "redacted")
    redact_corpus(spark, src, out)
    r = spark.read.parquet(out).collect()[0]
    assert r["text"] == "mail <EMAIL> thanks"
    assert r["text_sha"] == hashlib.sha256(r["text"].encode()).hexdigest()
    assert r["n_words"] == 3


def test_filter_max_pii_gate(spark, tmp_path):
    from indigo_crawler_spark.plans.export import (
        _write_export_manifest,
        filter_corpus,
    )

    rows = [
        ("https://a.example.org/1", "a.example.org", 0,
         "a directory page a@b.io c@d.io e@f.io 10.0.0.1", 3),
        ("https://b.example.org/2", "b.example.org", 0,
         "one contact x@y.zz in otherwise fine prose", 7),
        ("https://c.example.org/3", "c.example.org", 0, "no pii at all", 11),
    ]
    src = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "canon_url string, host string, fetch_round int, text string, pk int"
    ).repartition("pk").write.partitionBy("pk").parquet(src)
    _write_export_manifest(
        src, {"through_round": 0, "num_buckets": 16, "rows": len(rows)}
    )
    out = str(tmp_path / "filtered")
    rep = filter_corpus(spark, src, out, max_pii=1)
    got = {r["canon_url"] for r in spark.read.parquet(out).collect()}
    assert got == {"https://b.example.org/2", "https://c.example.org/3"}
    assert rep["dropped_by_reason"] == {"max_pii": 1}
