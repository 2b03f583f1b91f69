"""Change-rate-adaptive recrawl (SEMANTICS.md §Adaptive recrawl): engine ≡
oracle over multi-round crawls with recrawl_adaptive on — unchanged content
doubles a url's revisit interval, changed content (delivered mid-crawl
through the streaming ingest path, the one honest way content can change in
this page model) resets it, the cap pins it, the tick is idempotent, and
the knobs are recrawl_after-dependent hash extensions."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.operators.recrawl import (
    RECRAWL_SEED_RANK,
    adaptive_tick,
)
from indigo_crawler_spark.plans import schemas
from indigo_crawler_spark.plans.round import CrawlState, bootstrap, run_rounds
from indigo_crawler_spark.sources.fixture_df import (
    budgets_df,
    pages_df,
    robots_df,
    seeds_df,
)
from indigo_crawler_spark.sources.table_io import TableIO
from indigo_crawler_spark.streaming.skin import ingest_pages
from oracle.simulator import OracleCrawl


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


def _assert_rounds_equal(state, manifests, results):
    for r, (m, rr) in enumerate(zip(manifests, results)):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["rank_in_host"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [
            (e["canon_url"], e["rank_in_host"], e["global_rank"])
            for e in rr.emitted
        ]
        assert got == want, f"ordering mismatch at round {r}"
        assert m["counters"] == rr.counters, f"counters mismatch at round {r}"


def _engine_revisit(state, n_rounds):
    return {
        row["canon_url"]: (row["fetched_round"], row["interval"], row["digest"])
        for row in state.revisit_through(n_rounds).collect()
    }


def test_adaptive_engine_vs_oracle_doubling(spark, tmp_path):
    """Static content (the batch page model) ⇒ every refetch is unchanged ⇒
    intervals double; the whole crawl — ordering, counters incl.
    recrawl_unchanged, revisit state — matches the oracle bit-for-bit."""
    n_rounds = 8
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        recrawl_after=2,
        recrawl_adaptive=True,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(n_rounds)
    _assert_rounds_equal(state, manifests, results)

    # refetches happened and were all unchanged (content is static)
    assert sum(m["counters"]["recrawl_unchanged"] for m in manifests) > 0
    assert all(m["counters"]["recrawl_changed"] == 0 for m in manifests)

    # the committed revisit state equals the oracle's, and doubling is
    # visible: some url refetched twice carries interval 8 (2 -> 4 -> 8)
    got = _engine_revisit(state, n_rounds)
    assert got == oc.revisit
    assert any(iv >= 4 for (_fr, iv, _d) in got.values())
    # digests really are the extracted-text sha256
    u, (_fr, _iv, d) = next(iter(sorted(got.items())))
    all_texts: dict[str, str] = {}
    for rr in results:
        all_texts.update(rr.texts)
    assert d == hashlib.sha256(all_texts[u].encode("utf-8")).hexdigest()


def test_adaptive_changed_content_resets(spark, tmp_path):
    """Mid-crawl content change through the streaming ingest path (smaller
    warc_ts wins the store tie-break): the next refetch sees a different
    digest, counts recrawl_changed, and resets the interval to A — engine
    and oracle stepwise-identical through the interleaving."""
    n_rounds = 6
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        recrawl_after=2,
        recrawl_adaptive=True,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)

    # round 0 first, to learn which url was fetched
    manifests = run_rounds(spark, state, 1)
    fetched0 = sorted(
        row["canon_url"]
        for row in state.io.read(
            f"fetch_batches/round=0", schemas.FETCH_BATCHES
        ).collect()
        if row["canon_url"]
        in {
            r["canon_url"]
            for r in state.io.read("fetched_text/round=0", schemas.FETCHED_TEXT)
            .select("canon_url")
            .collect()
        }
    )
    target = fetched0[0]
    replacement = [
        {
            "url": target,
            # earlier than every fixture ts (tz-aware, like the fixtures)
            "warc_ts": datetime(2000, 1, 1, tzinfo=timezone.utc),
            "html": b"<html><body><p>entirely new content</p></body></html>",
            "text": "",
            "lang": "en",
        }
    ]
    ingest_pages(pages_df(spark, replacement), state)
    manifests += run_rounds(spark, state, n_rounds)

    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = []
    for r in range(n_rounds):
        if r == 1:
            oc.add_pages(replacement)
        oc.recrawl_tick(r, results)
        results.append(oc.step(r))
    _assert_rounds_equal(state, manifests, results)

    # the change registered exactly once, and the target's interval reset
    # to A at the changed refetch before doubling again
    assert sum(m["counters"]["recrawl_changed"] for m in manifests) >= 1
    got = _engine_revisit(state, n_rounds)
    assert got == oc.revisit
    fr, _iv, d = got[target]
    assert fr > 0  # the target really was refetched
    # its recorded digest is the sha256 of the REPLACED content's text —
    # the refetch went through the streamed store row
    assert d == hashlib.sha256(
        results[fr].texts[target].encode("utf-8")
    ).hexdigest()
    assert results[fr].texts[target] != results[0].texts[target]


def test_adaptive_cap_and_tick_idempotent(spark, tmp_path):
    """recrawl_max_interval pins the doubling; a replayed tick (crash shape)
    retires nothing and injects nothing new."""
    n_rounds = 7
    fb = fixture_bundle(**TINY)
    cfg = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        recrawl_after=1,
        recrawl_adaptive=True,
        recrawl_max_interval=2,
    )
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(n_rounds)
    _assert_rounds_equal(state, manifests, results)

    got = _engine_revisit(state, n_rounds)
    assert got == oc.revisit
    ivs = {iv for (_fr, iv, _d) in got.values()}
    assert max(ivs) == 2 and 1 in ivs  # capped at 2, fresh fetches at 1

    # replayed tick: whatever round n_rounds would re-open, a second tick
    # immediately after is a no-op (retire no-ops, inject skips pending)
    n1 = adaptive_tick(state, n_rounds)
    n2 = adaptive_tick(state, n_rounds)
    assert n2 == 0 and n1 >= 0


def test_adaptive_hash_extension_pins():
    """Dependent extensions: inert (hash-absent) while recrawl_after=0 at
    ANY value; always hashed once the master is on; flipping adaptive on
    changes the hash (results change)."""
    base = CrawlConfig()
    stray = CrawlConfig(recrawl_adaptive=True, recrawl_max_interval=9)
    assert stray.config_hash() == base.config_hash()
    assert "recrawl_adaptive" not in stray._hash_dict()

    aged = CrawlConfig(recrawl_after=2)
    adaptive = CrawlConfig(recrawl_after=2, recrawl_adaptive=True)
    capped = CrawlConfig(
        recrawl_after=2, recrawl_adaptive=True, recrawl_max_interval=4
    )
    assert "recrawl_adaptive" in aged._hash_dict()  # pinned once master on
    assert aged.config_hash() != adaptive.config_hash()
    assert adaptive.config_hash() != capped.config_hash()
