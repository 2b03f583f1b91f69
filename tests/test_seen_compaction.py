"""T1 — seen-set compaction: identical membership, bounded read fan-in."""

from __future__ import annotations

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from oracle.simulator import OracleCrawl

N = 5


def test_compaction_transparent_and_used(spark, tmp_path):
    cfg = CrawlConfig(round_limit=50, num_buckets=16, seen_compact_every=2)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "c")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, N)

    # snapshots exist for rounds 1 and 3 (every 2nd round)
    assert sorted(state._compact_uptos()) == [1, 3]

    # membership identical to the oracle (compaction is transparent)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    oc.run(N)
    got = {
        (r["canon_url"], r["first_round"]) for r in state.seen_through(N).collect()
    }
    assert got == set(oc.seen.items())

    # the read uses the newest snapshot + only trailing deltas
    files = state.seen_through(N).inputFiles()
    assert any("upto=3" in f for f in files)
    assert not any("round=1/" in f or "round=0/" in f for f in files)  # folded


def test_resume_killed_between_compaction_and_manifest(spark, tmp_path):
    """Kill window: compaction snapshot committed, round manifest not yet.

    Resume must recompute the round WITHOUT selecting-then-overwriting the
    snapshot (the 'Cannot overwrite a path that is also being read from'
    wedge), and a HALF-written snapshot (no _SUCCESS) must be ignored and
    rebuilt."""
    import os
    import shutil

    cfg = CrawlConfig(round_limit=50, num_buckets=16, seen_compact_every=2)
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, str(tmp_path / "k")), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    run_rounds(spark, state, 2)  # rounds 0,1; compaction upto=1 committed

    # simulate the kill: round 1's manifest vanishes but its data (incl. the
    # compact snapshot) survives → resume recomputes round 1
    os.remove(state.io.path("manifest", "round_00001.json"))
    run_rounds(spark, state, 2)  # must not wedge
    assert sorted(state._compact_uptos()) == [1]

    # half-written snapshot: no _SUCCESS ⇒ ignored by readers, rebuilt
    os.remove(state.io.path("seen_compact/upto=1", "_SUCCESS"))
    assert state._compact_uptos() == []
    os.remove(state.io.path("manifest", "round_00001.json"))
    run_rounds(spark, state, 2)
    assert sorted(state._compact_uptos()) == [1]

    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    oc.run(2)
    got = {
        (r["canon_url"], r["first_round"]) for r in state.seen_through(2).collect()
    }
    assert got == set(oc.seen.items())
    shutil.rmtree(str(tmp_path / "k"), ignore_errors=True)


def test_iceberg_seam_raises_without_runtime(spark, tmp_path):
    """fmt='iceberg' without an Iceberg catalog must fail LOUDLY at
    construction (no silent wrong branch), and TableIO.rewrite must survive
    a simulated crash between its two renames (parquet backend)."""
    import os

    import pytest as _pytest

    from indigo_crawler_spark.sources.table_io import TableIO

    with _pytest.raises(NotImplementedError, match="Iceberg"):
        TableIO(spark, "no_such_catalog.ns", fmt="iceberg")

    io = TableIO(spark, str(tmp_path / "rw"))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    io.write(df, "t")
    io.rewrite(io.read("t").where("id < 5"), "t")
    assert io.read("t").count() == 5
    # crash window: live dir missing, __old backup present → repaired
    os.rename(io.path("t"), io.path("t__old"))
    io.rewrite(io.read("t").where("id < 3"), "t")
    assert io.read("t").count() == 3
