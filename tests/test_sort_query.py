"""Sorted-query canonicalization (SEMANTICS.md §Sorted query): kernel
battery incl. the fixed-point rule and duplicate-key/empty-token grammar,
flag-off byte-identity, engine ≡ oracle where two parameter-order spellings
of one resource collapse to ONE scheduled fetch, flag-off schedules them
distinctly, composition with tracking-param stripping, and the hash pin."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.canonicalize import (
    canonicalize_url,
    sort_query_params,
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
from oracle.simulator import OracleCrawl


@pytest.mark.parametrize(
    ("query", "want"),
    [
        ("b=2&a=1", "a=1&b=2"),
        ("a=1&b=2", "a=1&b=2"),  # already sorted — unchanged
        ("a=1", "a=1"),
        ("", ""),
        ("a=2&a=1", "a=1&a=2"),  # duplicate keys order by full token bytes
        ("a&&b", "&a&b"),  # empty token sorts first and survives
        ("B=1&a=2", "B=1&a=2"),  # byte order: uppercase < lowercase
        ("a=%20&a=+", "a=%20&a=+"),  # no decoding: '%' (0x25) < '+' (0x2b)
        ("flag&a=1", "a=1&flag"),  # '='-less token sorts by its bytes
    ],
)
def test_sort_query_params_cases(query, want):
    assert sort_query_params(query) == want


def test_canonicalize_sort_and_fixed_point():
    # only the query token ORDER changes; scheme/host/path/fragment rules
    # are the base kernel's
    assert (
        canonicalize_url("https://Example.org:443/a/../b?z=9&a=1", False, False, True)
        == "https://example.org/b?a=1&z=9"
    )
    # queryless urls byte-identical under the flag
    assert (
        canonicalize_url("https://example.org/a", False, False, True)
        == "https://example.org/a"
    )
    # FIXED POINT: re-canonicalizing a sorted url is a no-op — the
    # property retire/inject/adaptive-recrawl rely on
    for u in (
        "https://example.org/p?z=1&y=2&x=3",
        "http://h.example.org/?b&a=1&a=0",
        "https://h2.example.org/deep?only=1",
    ):
        c1 = canonicalize_url(u, False, False, True)
        assert canonicalize_url(c1, False, False, True) == c1
    # composition with tracking-param stripping: strip first, then sort
    assert (
        canonicalize_url(
            "https://h3.example.org/p?z=1&utm_source=x&a=2", True, False, True
        )
        == "https://h3.example.org/p?a=2&z=1"
    )


def test_flag_off_byte_identity():
    for u in (
        "https://example.org/a?z=1&a=2",
        "HTTPS://EXAMPLE.ORG:443/a/./b?b&a",
        "http://h.example.org/x?y=1&x=0#frag",
    ):
        assert canonicalize_url(u) == canonicalize_url(u, False, False, False)
    # flag-off keeps the query byte-for-byte (order preserved)
    assert (
        canonicalize_url("https://example.org/a?z=1&a=2")
        == "https://example.org/a?z=1&a=2"
    )


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


def _with_reordered_alias(fb):
    """Give the first seed's resource a two-param query and add a second
    seed spelling the SAME query in the opposite parameter order: under
    sort-query the pair is ONE frontier row; off, two. The page store gets
    a row for each spelling so both are fetchable when distinct. Returns
    the canonically-SORTED spelling and the unsorted one."""
    fb = {k: list(v) for k, v in fb.items()}
    base = canonicalize_url(fb["seeds"][0]["url"])
    assert base is not None and "?" not in base
    sorted_u = base + "?a=1&b=2"
    unsorted_u = base + "?b=2&a=1"
    fb["seeds"][0] = dict(fb["seeds"][0], url=sorted_u)
    fb["seeds"].append({"url": unsorted_u, "seed_rank": 99})
    # store rows for both spellings (copy the original resource's page when
    # present; otherwise synthesize a minimal one) so the off-path can
    # fetch both distinctly
    page0 = next(
        (p for p in fb["pages"] if canonicalize_url(p["url"]) == base), None
    )
    for u in (sorted_u, unsorted_u):
        if page0 is not None:
            fb["pages"].append(dict(page0, url=u))
        else:
            fb["pages"].append(
                {
                    "url": u,
                    "warc_ts": fb["pages"][0]["warc_ts"],
                    "html": b"<html><body>q</body></html>",
                    "text": None,
                    "lang": "en",
                }
            )
    return fb, sorted_u, unsorted_u


def _run_both(spark, tmp_path, cfg, fb, n_rounds=2):
    state = _bootstrap(spark, tmp_path, cfg, fb)
    manifests = run_rounds(spark, state, n_rounds)
    oc = OracleCrawl(fb["pages"], fb["seeds"], fb["robots"], fb["host_budgets"], cfg)
    results = oc.run(n_rounds)
    emitted = []
    for r in range(n_rounds):
        df = state.io.read(f"fetch_batches/round={r}", schemas.FETCH_BATCHES)
        got = [
            (row["canon_url"], row["global_rank"])
            for row in df.orderBy("global_rank").collect()
        ]
        want = [(e["canon_url"], e["global_rank"]) for e in results[r].emitted]
        assert got == want, f"ordering mismatch at round {r}"
        assert manifests[r]["counters"] == results[r].counters, f"round {r}"
        emitted.extend(u for u, _g in got)
    return emitted


def test_sort_query_engine_vs_oracle(spark, tmp_path):
    fb0 = fixture_bundle(**TINY)
    fb, sorted_u, unsorted_u = _with_reordered_alias(fb0)

    # flag ON: one canonical key — both spellings merge into the sorted row
    cfg_on = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        sort_query_enabled=True,
    )
    emitted_on = _run_both(spark, tmp_path / "on", cfg_on, fb)
    assert emitted_on.count(sorted_u) == 1
    assert unsorted_u not in emitted_on
    # every emitted query is sorted (the key space is a sort fixed point)
    for u in emitted_on:
        if "?" in u:
            q = u.split("?", 1)[1]
            assert q == "&".join(sorted(q.split("&")))

    # flag OFF (positive inertness): the two spellings schedule distinctly
    cfg_off = CrawlConfig(
        round_limit=50, num_buckets=16, bloom_bucket_capacity=64
    )
    emitted_off = _run_both(spark, tmp_path / "off", cfg_off, fb)
    assert sorted_u in emitted_off and unsorted_u in emitted_off


def test_sort_query_hash_extension():
    base = CrawlConfig()
    assert "sort_query_enabled" not in base._hash_dict()
    on = CrawlConfig(sort_query_enabled=True)
    assert on.config_hash() != base.config_hash()
