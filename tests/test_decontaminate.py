"""Benchmark decontamination (operators/decontaminate.py): exact n-gram
collision semantics on hand fixtures; hash mode equals exact mode. The
driver query `decontaminate_flags` pins the DuckDB parity."""

from __future__ import annotations

from indigo_crawler_spark.operators.decontaminate import (
    contamination_flags,
    decontaminate,
)

EVAL_SENT = "the quick brown fox jumps over the lazy dog today"  # 10 words


def _corpus(spark):
    rows = [
        # contains the eval sentence verbatim -> collides at n=5
        ("u_hit", f"prefix words {EVAL_SENT} suffix words"),
        # shares only a 4-word window ("quick brown fox jumps") -> no 5-gram
        ("u_near", "so quick brown fox jumps away from here entirely now"),
        ("u_clean", "completely unrelated text about spark shuffle planning"),
        # the same colliding 5-grams TWICE -> still counted once each
        ("u_dup", f"{EVAL_SENT} and then {EVAL_SENT}"),
    ]
    return spark.createDataFrame(rows, "canon_url string, text string")


def _eval_df(spark):
    return spark.createDataFrame([(EVAL_SENT,)], "text string")


class TestContamination:
    def test_flags_exact(self, spark):
        flags = {
            r["canon_url"]: r["n_hits"]
            for r in contamination_flags(
                _corpus(spark), _eval_df(spark), n=5, exact=True
            ).collect()
        }
        # 10-word eval sentence has 6 distinct 5-grams; u_hit contains all 6
        assert flags == {"u_hit": 6, "u_dup": 6}

    def test_near_miss_not_flagged(self, spark):
        # 4-word overlap is below the n=5 window by construction
        flags = contamination_flags(
            _corpus(spark), _eval_df(spark), n=5, exact=True
        )
        assert "u_near" not in {r["canon_url"] for r in flags.collect()}
        # at n=4 it IS flagged
        flags4 = {
            r["canon_url"]
            for r in contamination_flags(
                _corpus(spark), _eval_df(spark), n=4, exact=True
            ).collect()
        }
        assert "u_near" in flags4

    def test_hash_mode_equals_exact_mode(self, spark):
        a = sorted(
            tuple(r)
            for r in contamination_flags(
                _corpus(spark), _eval_df(spark), n=5, exact=True
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in contamination_flags(
                _corpus(spark), _eval_df(spark), n=5, exact=False
            ).collect()
        )
        assert a == b

    def test_decontaminate_drops_only_flagged(self, spark):
        kept = {
            r["canon_url"]
            for r in decontaminate(
                _corpus(spark), _eval_df(spark), n=5
            ).collect()
        }
        assert kept == {"u_near", "u_clean"}

    def test_short_eval_docs_no_grams(self, spark):
        ev = spark.createDataFrame([("too short",)], "text string")
        flags = contamination_flags(_corpus(spark), ev, n=5, exact=True)
        assert flags.count() == 0
