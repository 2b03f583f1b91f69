"""T1 — round-5 training-pipeline additions: repetition signals, hash-based
dataset splits, and cross-document boilerplate detection/removal.

Oracles here are hand-computed Python (the driver's DuckDB gate covers the
SQL twins via queries `repetition_stats`, `hash_split`,
`boilerplate_shingles`); these tests pin the semantics on adversarial
fixtures the synthetic corpus doesn't exercise — all-boilerplate documents,
intra-document repeats, empty lines, order preservation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from indigo_crawler_spark.functions.text_analysis import (
    SPLIT_BOUNDS,
    hash_split_expr,
    repetition_exprs,
)
from indigo_crawler_spark.operators.boilerplate import (
    boilerplate_ngrams,
    ngram_expr,
    remove_boilerplate_lines,
)


class TestRepetition:
    def test_hand_computed(self, spark):
        # "a a b a" -> words: a=3,b=1 -> top=3, dup=3; bigrams: "a a","a b",
        # "b a" all distinct -> dup_bigram=0
        # "x y x y x" -> words: x=3,y=2 -> top=3, dup=5; bigrams:
        # "x y"x2,"y x"x2 -> dup=4
        df = spark.createDataFrame(
            [(0, "a a b a"), (1, "x y x y x")], "doc_id long, text string"
        )
        exprs = repetition_exprs("text")
        rows = {
            r["doc_id"]: r.asDict()
            for r in df.select("doc_id", *[v.alias(k) for k, v in exprs.items()]).collect()
        }
        assert rows[0]["n_words"] == 4
        assert rows[0]["top_word_count"] == 3
        assert rows[0]["dup_word_occ"] == 3
        assert rows[0]["n_bigrams"] == 3
        assert rows[0]["dup_bigram_occ"] == 0
        assert rows[1]["top_word_count"] == 3
        assert rows[1]["dup_word_occ"] == 5
        assert rows[1]["dup_bigram_occ"] == 4

    def test_single_word_no_bigrams(self, spark):
        df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
        exprs = repetition_exprs("text")
        r = df.select(*[v.alias(k) for k, v in exprs.items()]).collect()[0]
        assert r["n_words"] == 1 and r["n_bigrams"] == 0
        assert r["dup_word_occ"] == 0 and r["dup_bigram_occ"] == 0


class TestHashSplit:
    def test_matches_python_md5(self, spark):
        keys = list(range(200))
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        bucket, split = hash_split_expr("k")
        got = {
            r["k"]: (r["bucket"], r["split"])
            for r in df.select("k", bucket.alias("bucket"), split.alias("split")).collect()
        }
        lo, hi = SPLIT_BOUNDS
        for k in keys:
            b = int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16) % 100
            s = "train" if b < lo else ("valid" if b < hi else "test")
            assert got[k] == (b, s), k

    def test_stable_under_repartition_and_growth(self, spark):
        # content-addressed: the assignment of key k never depends on what
        # other rows exist or how the frame is partitioned
        small = spark.createDataFrame([(k,) for k in range(50)], "k long")
        big = spark.createDataFrame([(k,) for k in range(500)], "k long").repartition(7)
        bucket, split = hash_split_expr("k")
        a = {r["k"]: r["s"] for r in small.select("k", split.alias("s")).collect()}
        b = {r["k"]: r["s"] for r in big.select("k", split.alias("s")).collect()}
        assert all(b[k] == v for k, v in a.items())
        # fractions land near 80/10/10 on 500 keys
        from collections import Counter

        c = Counter(b.values())
        assert 0.7 <= c["train"] / 500 <= 0.9
        assert c["valid"] > 0 and c["test"] > 0


class TestBoilerplateNgrams:
    def test_ngram_expr_windows(self, spark):
        df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
        got = [r[0] for r in df.select(ngram_expr("text", 3)).collect()]
        assert got[0] == ["a b c", "b c d"]
        assert got[1] == []

    def test_distinct_before_count(self, spark):
        # the shingle repeats TWICE inside doc 0 but must count doc 0 once
        docs = spark.createDataFrame(
            [
                (0, "nav bar here x nav bar here"),
                (1, "nav bar here y"),
                (2, "nav bar here z"),
                (3, "unrelated text entirely different"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["shingle"]: r["n_docs"]
            for r in boilerplate_ngrams(docs, n=3, min_docs=3).collect()
        }
        assert out == {"nav bar here": 3}


FOOTER = "copyright 2026 example corp"
NAV = "home | about | contact"


class TestRemoveBoilerplate:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            ("u0", f"{NAV}\nunique zero body\n{FOOTER}"),
            ("u1", f"{NAV}\nunique one body\nmore one\n{FOOTER}"),
            ("u2", f"{NAV}\nunique two body\n{FOOTER}"),
            ("u3", f"{NAV}\n{FOOTER}"),  # all-boilerplate doc
            ("u4", "totally bespoke page with no chrome"),
        ]
        return spark.createDataFrame(rows, "canon_url string, text string")

    def test_scrub_preserves_order_and_rowcount(self, spark, corpus):
        out = remove_boilerplate_lines(corpus, min_docs=3)
        got = {r["canon_url"]: r["text"] for r in out.collect()}
        assert len(got) == 5  # row count preserved
        assert got["u0"] == "unique zero body"
        assert got["u1"] == "unique one body\nmore one"  # order kept
        assert got["u2"] == "unique two body"
        assert got["u3"] == ""  # all lines were boilerplate
        assert got["u4"] == "totally bespoke page with no chrome"

    def test_threshold_respected(self, spark, corpus):
        # min_docs=5: NAV appears in 4 docs, FOOTER in 4 -> nothing removed
        out = remove_boilerplate_lines(corpus, min_docs=5)
        orig = {r["canon_url"]: r["text"] for r in corpus.collect()}
        got = {r["canon_url"]: r["text"] for r in out.collect()}
        assert got == orig

    def test_counters_ride_the_action(self, spark, corpus):
        from pyspark.sql import Observation

        obs = {"lines": Observation(), "kept": Observation(), "hot": Observation()}
        out = remove_boilerplate_lines(corpus, min_docs=3, counters=obs)
        out.collect()
        n_lines = obs["lines"].get["n"]
        n_kept = obs["kept"].get["n"]
        n_hot = obs["hot"].get["n"]
        assert n_hot == 2  # NAV and FOOTER hashes
        assert n_lines == 3 + 4 + 3 + 2 + 1
        assert n_lines - n_kept == 8  # 4 NAV + 4 FOOTER occurrences dropped

    def test_passthrough_columns_survive(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "x\ny"), ("b", 2, "x\nz"), ("c", 3, "x\nw")],
            "canon_url string, depth int, text string",
        )
        out = remove_boilerplate_lines(df, min_docs=3)
        assert set(out.columns) == {"canon_url", "depth", "text"}
        got = {r["canon_url"]: (r["depth"], r["text"]) for r in out.collect()}
        assert got == {"a": (1, "y"), "b": (2, "z"), "c": (3, "w")}


class TestAnsiEmptyText:
    def test_quality_exprs_null_ratios_on_empty(self, spark):
        # Spark 4 defaults ANSI on: a plain divide would THROW on the 0-char
        # denominator (and constant-fold the throw when text is lit("") — the
        # all-boilerplate branch of remove_boilerplate_lines). try_divide
        # pins the documented NULL-ratio semantics instead.
        from pyspark.sql import functions as F

        from indigo_crawler_spark.functions.text_analysis import quality_exprs

        exprs = quality_exprs(F.lit(""))
        r = spark.range(1).select(
            *[v.alias(k) for k, v in exprs.items()]
        ).collect()[0]
        assert r["n_chars"] == 0 and r["n_words"] == 0
        assert r["punct_ratio"] is None
        assert r["space_ratio"] is None
        assert r["mean_word_len"] is None
