"""State GC (plans/state_gc.py): reclaim superseded versioned tables without
disturbing resume, fsck, or bit-exactness of the continued crawl.

The strong claim under test: a crawl that is GC'd at its anchor and then
extended produces BIT-IDENTICAL committed state (manifest digests, fetch
ordering, texts, seen membership, frontier) to an uninterrupted run that was
never GC'd — because the protected set is exactly what the engine still
reads (seen deltas past the newest compact snapshot, the anchor tables, the
cumulative filter, the feedback dimensions entering round L+1).
"""

from __future__ import annotations

from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.plans.round import fsck, last_complete_round, run_rounds
from indigo_crawler_spark.plans.state_gc import gc_plan, gc_state
from tests.test_resume import _bootstrap, _snapshot

CFG = CrawlConfig(
    round_limit=6, num_buckets=8, bloom_bucket_capacity=64, seen_compact_every=4
)


def test_gc_plan_protected_set():
    """Pure keep/reclaim algebra at anchor L=9 with complete snapshots at
    upto=3,7 and a kill-leftover incomplete snapshot at upto=5."""
    versions = {
        "seen": list(range(11)),            # 10 = partial in-flight round
        "frontier": list(range(11)),
        "seen_bloom": list(range(10)),
        "heavy_hosts_frontier": [9, 10],
        "host_budgets": [9, 10],
        "fetch_batches": list(range(10)),
        "fetched_text": list(range(10)),
        "round_metrics": list(range(10)),
    }
    drop = set(gc_plan(9, [3, 7], [5], versions, keep_outputs=True))
    # seen: deltas ≤ newest snapshot (upto=7) reclaimed; 8,9 feed
    # seen_through; 9 is the anchor verify; 10 is in-flight — resume's job
    assert {f"seen/round={v}" for v in range(8)} <= drop
    assert not {"seen/round=8", "seen/round=9", "seen/round=10"} & drop
    # frontier: consumed ≤ L; L+1 is the anchor/next input
    assert {f"frontier/round={v}" for v in range(10)} <= drop
    assert "frontier/round=10" not in drop
    # cumulative filter: only round L survives
    assert {f"seen_bloom/round={v}" for v in range(9)} <= drop
    assert "seen_bloom/round=9" not in drop
    # snapshots: older complete subset + dead incomplete leftover go
    assert {"seen_compact/upto=3", "seen_compact/upto=5"} <= drop
    assert "seen_compact/upto=7" not in drop
    # feedback dims entering round L+1 stay
    assert {"heavy_hosts_frontier/round=9", "host_budgets/round=9"} <= drop
    assert not {"heavy_hosts_frontier/round=10", "host_budgets/round=10"} & drop
    # products are not state
    assert not any(t.startswith(("fetch_batches", "fetched_text", "round_metrics"))
                   for t in drop)
    # without any snapshot every delta is live
    assert not any(
        t.startswith("seen/") for t in gc_plan(9, [], [], versions)
    )


def test_gc_then_resume_bit_exact(spark, tmp_path):
    # uninterrupted reference: 14 rounds, never GC'd
    a = _bootstrap(spark, str(tmp_path / "a"), CFG)
    run_rounds(spark, a, 14)
    ref = _snapshot(a, 14)

    # GC'd run: 10 rounds (snapshots at upto=3,7; anchor L=9), reclaim, extend
    b = _bootstrap(spark, str(tmp_path / "b"), CFG)
    run_rounds(spark, b, 10)
    assert last_complete_round(b) == 9
    assert b.io.is_complete("seen_compact/upto=7")
    report = gc_state(b)
    assert report["anchor"] == 9
    assert report["bytes_reclaimed"] > 0
    dropped = set(report["reclaimed"])
    assert {f"seen/round={v}" for v in range(8)} <= dropped
    assert {"seen_compact/upto=3", "frontier/round=0", "seen_bloom/round=0"} <= dropped

    # on disk: protected set intact, reclaimed set gone
    for kept in ("seen/round=8", "seen/round=9", "frontier/round=10",
                 "seen_bloom/round=9", "seen_compact/upto=7", "page_store",
                 "fetch_batches/round=0", "fetched_text/round=9"):
        assert b.io.exists(kept), kept
    for gone in dropped:
        assert not b.io.exists(gone), gone

    # fsck: reclaimed ≠ corrupt — markers, no False anywhere
    rep = fsck(b)
    assert rep[0]["seen"] == "reclaimed" and rep[0]["frontier_next"] == "reclaimed"
    assert rep[9]["seen"] is True and rep[9]["frontier_next"] is True
    assert not any(v is False for r in rep.values() for v in r.values())

    # second GC reclaims nothing (idempotent), generation does not advance
    again = gc_state(b)
    assert again["reclaimed"] == [] and again["generation"] == report["generation"]

    # extend past the GC point — including a fresh compaction at round 11
    # that unions the kept snapshot + kept deltas — and compare EVERYTHING
    manifests = run_rounds(spark, b, 14)
    assert [m["round"] for m in manifests] == list(range(10, 14))
    assert b.io.is_complete("seen_compact/upto=11")
    assert _snapshot(b, 14) == ref

    # products are reclaimable on request once shipped
    rep2 = gc_state(b, keep_outputs=False)
    assert "fetch_batches/round=0" in rep2["reclaimed"]
    assert not b.io.exists("fetched_text/round=3")
    assert rep2["generation"] == report["generation"] + 1

    # in-loop periodic GC (run_rounds gc_every — the months-long-crawl
    # mode): same 14 rounds with a GC after every 4th, still bit-identical
    c = _bootstrap(spark, str(tmp_path / "c"), CFG)
    run_rounds(spark, c, 14, gc_every=4)
    assert (c.io.read_manifest("gc") or {}).get("generation", 0) >= 3
    assert not c.io.exists("frontier/round=0")
    assert _snapshot(c, 14) == ref
