"""T3 — durability: kill-mid-round → resume → bit-equal to uninterrupted run.

The commit protocol is data-files-first, manifest-last; a round without its
manifest is invisible and gets recomputed deterministically on resume.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import (
    CrawlState,
    bootstrap,
    last_complete_round,
    run_rounds,
)
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO

CFG = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
N = 3


def _bootstrap(spark, root, cfg=CFG):
    fb = fixture_bundle(**TINY)
    state = CrawlState(io=TableIO(spark, root), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    return state


def _snapshot(state, n):
    """Everything observable: ordering, seen, frontier, texts, manifests."""
    io = state.io
    fb = []
    for r in range(n):
        df = io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        fb.append(sorted(tuple(row) for row in df.collect()))
    seen = sorted(
        (row["canon_url"], row["first_round"])
        for row in state.seen_through(n).collect()
    )
    frontier = sorted(
        tuple(row) for row in io.read(f"frontier/round={n}", schemas.FRONTIER).collect()
    )
    texts = {}
    for r in range(n):
        for row in io.read(f"fetched_text/round={r}", schemas.FETCHED_TEXT).collect():
            texts[row["canon_url"]] = row["text"]
    manifests = [io.read_manifest(f"round_{r:05d}") for r in range(n)]
    return fb, seen, frontier, texts, manifests


def test_kill_mid_round_resume_bit_exact(spark, tmp_path):
    # uninterrupted reference run
    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, N)
    ref = _snapshot(a, N)

    # interrupted run: 2 committed rounds, then a simulated kill mid-round-2 —
    # partial data written (garbage), NO manifest
    b = _bootstrap(spark, str(tmp_path / "b"))
    run_rounds(spark, b, 2)
    assert last_complete_round(b) == 1
    partial = b.io.path("fetch_batches/round=2")
    os.makedirs(partial, exist_ok=True)
    b.io.read("fetch_batches/round=1", schemas.FETCH_BATCHES).limit(3).write.mode(
        "overwrite"
    ).parquet(partial)  # wrong, partial content
    shutil.copytree(b.io.path("seen/round=1"), b.io.path("seen/round=2"))  # more garbage

    # resume: rounds 0-1 skipped, round 2 recomputed & overwritten
    manifests = run_rounds(spark, b, N)
    assert [m["round"] for m in manifests] == [2]
    assert _snapshot(b, N) == ref


def test_deep_chain_kill_at_round_17_of_24(spark, tmp_path):
    """Long-horizon durability: kill mid-round-17 of 24 with compaction
    every 8 rounds. The resume anchor (round 16) then sits ON a compacted
    seen snapshot (upto=15) plus one delta — the earlier kill points cover
    the compaction window itself but not a deep chain anchored past a
    snapshot — and the recompute must replay rounds 17-23 (including the
    round-23 compaction) to bit-equality with an uninterrupted run. The
    small round_limit keeps the frontier from draining before round 24."""
    n = 24
    cfg = CrawlConfig(
        round_limit=6, num_buckets=8, bloom_bucket_capacity=64,
        seen_compact_every=8,
    )
    a = _bootstrap(spark, str(tmp_path / "a"), cfg)
    run_rounds(spark, a, n)
    ref = _snapshot(a, n)

    b = _bootstrap(spark, str(tmp_path / "b"), cfg)
    run_rounds(spark, b, 17)
    assert last_complete_round(b) == 16
    assert b.io.is_complete("seen_compact/upto=15")  # anchor is post-snapshot
    # simulated kill mid-round-17: partial garbage data, NO manifest
    partial = b.io.path("fetch_batches/round=17")
    os.makedirs(partial, exist_ok=True)
    b.io.read("fetch_batches/round=16", schemas.FETCH_BATCHES).limit(2).write.mode(
        "overwrite"
    ).parquet(partial)

    manifests = run_rounds(spark, b, n)
    assert [m["round"] for m in manifests] == list(range(17, n))
    assert b.io.is_complete("seen_compact/upto=23")  # deep-chain compaction ran
    assert _snapshot(b, n) == ref


def test_rerun_is_idempotent(spark, tmp_path):
    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, 2)
    snap1 = _snapshot(a, 2)
    assert run_rounds(spark, a, 2) == []  # nothing to do
    assert _snapshot(a, 2) == snap1


def test_resume_refuses_corrupt_state(spark, tmp_path):
    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, 2)
    # corrupt the committed frontier for round 2 (drop rows behind the manifest)
    f2 = a.io.read("frontier/round=2", schemas.FRONTIER)
    f2_cut = f2.where(F.col("canon_url") > "https://m").cache()
    f2_cut.count()
    f2_cut.write.mode("overwrite").parquet(a.io.path("frontier/round=2"))
    with pytest.raises(RuntimeError, match="lineage digest mismatch"):
        run_rounds(spark, a, 3)


def test_resume_refuses_config_change(spark, tmp_path):
    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, 2)
    other = CrawlState(io=a.io, cfg=CrawlConfig(round_limit=7, num_buckets=16))
    with pytest.raises(RuntimeError, match="config_hash mismatch"):
        run_rounds(spark, other, 3)


def test_resume_accepts_legacy_config_hash(spark, tmp_path):
    """A state dir whose manifests carry the PRE-capacity-exclusion hash
    (full asdict including bloom_bucket_capacity) must stay resumable under
    the same semantics — the hash-scheme change itself must never trigger
    the mismatch refusal it was introduced to avoid (ADVICE r4)."""
    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, 2)
    cap = a.io.read_manifest("bootstrap")["bloom_bucket_capacity"]
    legacy = CFG.config_hash_legacy(cap)
    assert legacy != CFG.config_hash()  # the schemes genuinely differ
    for r in range(2):
        m = a.io.read_manifest(f"round_{r:05d}")
        m["config_hash"] = legacy
        a.io.write_manifest(f"round_{r:05d}", m)
    fresh = CrawlState(io=TableIO(spark, str(tmp_path / "a")), cfg=CFG)
    manifests = run_rounds(spark, fresh, N)  # must not refuse
    assert [m["round"] for m in manifests] == [2]


def test_fsck_catches_old_round_corruption(spark, tmp_path):
    """`fsck` verifies the WHOLE committed chain in one Spark job — the
    resume path only verifies the anchor round, so corruption in an OLD
    round's files (behind its manifest) is invisible to resume but must be
    flagged by fsck, round-exactly."""
    from indigo_crawler_spark.plans.round import fsck

    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, 3)
    clean = fsck(a)
    assert sorted(clean) == [0, 1, 2]
    assert all(all(v.values()) for v in clean.values())

    # drop one row from round 0's committed seen delta, keeping its manifest
    seen0 = a.io.read("seen/round=0", schemas.SEEN)
    victim = seen0.orderBy("canon_url").limit(1).collect()[0]["canon_url"]
    cut = seen0.where(F.col("canon_url") != victim).cache()
    cut.count()
    cut.write.mode("overwrite").parquet(a.io.path("seen/round=0"))
    cut.unpersist()

    got = fsck(a)
    assert got[0]["seen"] is False  # the corrupted table, flagged
    assert got[0]["frontier_next"]  # sibling table in the same round: clean
    assert all(all(v.values()) for r, v in got.items() if r != 0)
    # resume would NOT have seen it: the anchor (round 2) still verifies
    assert run_rounds(spark, a, 3) == []


def test_corrupt_write_refuses_commit(spark, tmp_path):
    """Commit-time materialization cross-check: a write that loses rows on
    the way to disk must refuse the round's manifest AT COMMIT TIME (parquet
    footer counts vs the observed frame counts), not at the next resume's
    file re-read."""
    st = _bootstrap(spark, str(tmp_path / "c"))
    io = st.io
    orig_write = io.write

    def torn_write(df, table, partition_by=None):
        orig_write(df, table, partition_by=partition_by)
        if table == "seen/round=0":
            # simulate a torn write: drop one NON-EMPTY committed part file
            # while _SUCCESS stays — exactly the corruption the digest-of-
            # intent protocol alone would only catch at the next resume
            import pyarrow.parquet as pq

            p = io.path(table)
            for f in sorted(os.listdir(p)):
                fp = os.path.join(p, f)
                if f.endswith(".parquet") and pq.ParquetFile(fp).metadata.num_rows:
                    os.remove(fp)
                    return
            raise AssertionError("no non-empty part file to corrupt")

    io.write = torn_write
    with pytest.raises(RuntimeError, match="write cross-check failed"):
        run_rounds(spark, st, 1)
    assert st.io.read_manifest("round_00000") is None  # nothing committed


def test_kill_after_inject_resume_bit_exact(spark, tmp_path):
    """Injected seeds survive a mid-round kill: round R's replay re-reads
    the same committed ``injected/round=R`` side table, so resume is
    bit-equal to the uninterrupted injected run (and the pinned frontier
    file the anchor verify digests was never mutated)."""
    from indigo_crawler_spark.operators.inject import inject_seeds

    extra = [
        ("https://mid-crawl-seed.example.org/a",),
        ("https://mid-crawl-seed.example.org/b",),
    ]

    # uninterrupted reference: 2 rounds, inject, third round
    a = _bootstrap(spark, str(tmp_path / "a"))
    run_rounds(spark, a, 2)
    n_a = inject_seeds(a, spark.createDataFrame(extra, "url string"))
    assert n_a == len(extra)
    run_rounds(spark, a, N)
    ref = _snapshot(a, N)

    # interrupted: same injection, then a simulated kill mid-round-2
    b = _bootstrap(spark, str(tmp_path / "b"))
    run_rounds(spark, b, 2)
    assert inject_seeds(b, spark.createDataFrame(extra, "url string")) == n_a
    partial = b.io.path("fetch_batches/round=2")
    os.makedirs(partial, exist_ok=True)
    b.io.read("fetch_batches/round=1", schemas.FETCH_BATCHES).limit(2).write.mode(
        "overwrite"
    ).parquet(partial)

    manifests = run_rounds(spark, b, N)
    assert [m["round"] for m in manifests] == [2]
    assert _snapshot(b, N) == ref
