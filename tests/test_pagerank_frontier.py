"""Link-graph frontier prioritization (SEMANTICS.md §PageRank priority):
the integer-PageRank tick re-scores the frontier, engine ≡ oracle over a
multi-tick crawl (ordering + priorities + counters + texts), the Spark
integer kernel reproduces the pure-Python one bit-for-bit, ticks never
compound, and the knobs follow the dependent-extension hash scheme."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.pagerank import PR_SCALE, pagerank_int_py
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from oracle.simulator import OracleCrawl

N_ROUNDS = 5


def _bootstrap(spark, tmp_path, cfg, fb):
    state = CrawlState(io=TableIO(spark, str(tmp_path)), cfg=cfg)
    bootstrap(
        spark,
        pages_df(spark, fb["pages"]),
        seeds_df(spark, fb["seeds"]),
        robots_df(spark, fb["robots"]),
        budgets_df(spark, fb["host_budgets"]),
        state,
    )
    return state


def test_pagerank_int_spark_equals_kernel(spark):
    """Spark pagerank_int ≡ pure-Python kernel EXACTLY (integer equality),
    on a graph with hubs, chains, dangling nodes, self-loops and dup edges,
    across a forced multi-partition exchange."""
    from indigo_crawler_spark.operators.pagerank import pagerank_int

    edges = []
    for i in range(120):
        edges.append((f"n{i}", f"n{(i * 7) % 40}"))     # hub-ish fan-in
        edges.append((f"n{i}", f"n{(i + 1) % 120}"))    # ring
    edges.append(("n3", "n3"))                          # self-loop
    edges.append(("n0", "n7"))
    edges.append(("n0", "n7"))                          # duplicate edge
    edges.append(("n5", "dangling_target"))             # node with no out-links

    want = pagerank_int_py(edges, iters=4)
    df = spark.createDataFrame(edges, schemas.LINKS).repartition(11)
    got = {
        r["node"]: r["rank_int"]
        for r in pagerank_int(df, iters=4).collect()
    }
    assert got == want
    # mass is conserved up to floor losses and never exceeds the scale
    assert 0 < sum(got.values()) <= PR_SCALE


def test_pagerank_int_empty_and_bounds(spark):
    from indigo_crawler_spark.operators.pagerank import pagerank_int

    empty = spark.createDataFrame([], schemas.LINKS)
    assert pagerank_int(empty, iters=2).count() == 0
    assert pagerank_int_py([], iters=2) == {}
    with pytest.raises(ValueError):
        pagerank_int_py([("a", "b")], damping_pct=0)
    with pytest.raises(ValueError):
        pagerank_int(empty, damping_pct=100)


def test_pagerank_engine_vs_oracle(spark, tmp_path):
    """Engine ≡ oracle with pagerank_every=2 over 5 rounds (ticks rescore
    the frontiers entering rounds 2 and 4): emitted ordering, bit-exact
    priorities, counters, texts, and the committed pagerank tables match
    the kernel run on the oracle's edge set."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        pagerank_every=2,
        pagerank_iters=3,
        pagerank_weight=4.0,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)

    for r in range(N_ROUNDS):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["priority"], row["rank_in_host"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["priority"], e["rank_in_host"], e["global_rank"])
            for e in results[r].emitted
        ]
        assert got == want, f"ordering/priority mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        texts = {
            row["canon_url"]: row["text"]
            for row in state.io.read(
                f"fetched_text/round={r}", schemas.FETCHED_TEXT
            ).collect()
        }
        assert texts == results[r].texts, f"text mismatch at round {r}"

    # the committed rank table at each tick equals the kernel over the
    # oracle's accumulated edge set at that point in the crawl
    assert oc.pr_edges, "fixture crawl must have extracted links"
    for tick in (2, 4):
        assert state.io.exists(f"pagerank/round={tick}")
    final_ranks = {
        row["node"]: row["rank_int"]
        for row in state.io.read("pagerank/round=4", schemas.PAGERANK).collect()
    }
    # oracle edges as of the round-4 tick = all edges from rounds 0..3;
    # re-run the crawl's first 4 rounds on a fresh oracle to snapshot them
    oc2 = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    oc2.run(4)
    assert final_ranks == pagerank_int_py(oc2.pr_edges, iters=cfg.pagerank_iters)

    # at least one frontier row actually carried a non-zero boost at a tick
    pr = final_ranks
    f4 = state.io.read("frontier/round=4", schemas.FRONTIER).collect()
    assert any(row["canon_url"] in pr and pr[row["canon_url"]] > 0 for row in f4)


def test_pagerank_off_is_inert(spark, tmp_path):
    """Flag off ⇒ no links/pagerank tables, and the committed digests are
    byte-identical to a pre-feature crawl (the hot path is untouched)."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(round_limit=50, num_buckets=16, bloom_bucket_capacity=64)
    state = _bootstrap(spark, tmp_path, cfg, fb)
    run_rounds(spark, state, 2)
    assert not state.io.exists("links/round=0")
    assert not state.io.exists("pagerank/round=1")


def test_pagerank_config_hash_extension():
    """Dependent-extension scheme: the knobs are hash-absent at defaults,
    inert iters/weight stay absent while the tick is off, and flipping the
    tick on pins ALL THREE (so a future default change can't silently
    alter committed semantics)."""
    base = CrawlConfig()
    assert CrawlConfig(pagerank_iters=9).config_hash() == base.config_hash()
    assert CrawlConfig(pagerank_weight=0.5).config_hash() == base.config_hash()
    on = CrawlConfig(pagerank_every=2)
    assert on.config_hash() != base.config_hash()
    assert "pagerank_iters" in on._hash_dict()
    assert "pagerank_weight" in on._hash_dict()
    assert (
        CrawlConfig(pagerank_every=2, pagerank_iters=9).config_hash()
        != on.config_hash()
    )


def test_pagerank_resume_bit_exact(spark, tmp_path):
    """A crawl split across two run_rounds segments — the second resuming
    through a tick round — commits byte-identical orderings and rank
    tables to an uninterrupted run (the integer rank is a pure function of
    committed links, so the tick replays exactly)."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        pagerank_every=2,
        pagerank_weight=4.0,
    )
    a = _bootstrap(spark, tmp_path / "a", cfg, fb)
    run_rounds(spark, a, 3)          # stops after round 2 (tick at round 2)
    run_rounds(spark, a, N_ROUNDS)   # resume through the round-4 tick
    b = _bootstrap(spark, tmp_path / "b", cfg, fb)
    run_rounds(spark, b, N_ROUNDS)

    for r in range(N_ROUNDS):
        fa = [
            (row["canon_url"], row["priority"], row["global_rank"])
            for row in a.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
            .orderBy("global_rank")
            .collect()
        ]
        fbx = [
            (row["canon_url"], row["priority"], row["global_rank"])
            for row in b.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
            .orderBy("global_rank")
            .collect()
        ]
        assert fa == fbx, f"resumed ordering diverged at round {r}"
    for tick in (2, 4):
        ra = {
            row["node"]: row["rank_int"]
            for row in a.io.read(f"pagerank/round={tick}", schemas.PAGERANK).collect()
        }
        rb = {
            row["node"]: row["rank_int"]
            for row in b.io.read(f"pagerank/round={tick}", schemas.PAGERANK).collect()
        }
        assert ra == rb, f"rank table diverged at tick {tick}"


def test_pagerank_links_compaction(spark, tmp_path):
    """With a tight compaction cadence the tick folds the links chain into
    links_compact snapshots; the crawl still matches the plain oracle
    (compaction is physical-only) and links_through returns exactly the
    raw per-round union's edge multiset."""
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        seen_compact_every=2,
        pagerank_every=2,
        pagerank_weight=4.0,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, N_ROUNDS)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(N_ROUNDS)
    for r in range(N_ROUNDS):
        got = [
            (row["canon_url"], row["priority"])
            for row in state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
            .orderBy("global_rank")
            .collect()
        ]
        want = [(e["canon_url"], e["priority"]) for e in results[r].emitted]
        assert got == want, f"round {r} diverged under links compaction"
        assert manifests[r]["counters"] == results[r].counters

    # snapshots actually happened (ticks at rounds 1 and 3 see >= 2 deltas)
    uptos = state._links_compact_uptos()
    assert uptos, "compaction cadence 2 must have folded the links chain"
    # the compacted read is the same edge multiset as the raw chain
    through = sorted(
        (row["src"], row["dst"])
        for row in state.links_through(N_ROUNDS - 1).collect()
    )
    raw = []
    for i in range(N_ROUNDS):
        if state.io.exists(f"links/round={i}"):
            raw += [
                (row["src"], row["dst"])
                for row in state.io.read(f"links/round={i}", schemas.LINKS).collect()
            ]
    assert through == sorted(raw)
