"""Session-identifier stripping (SEMANTICS.md §Session identifiers):
query-side and path-side kernel batteries incl. the aspsessionid* prefix
rule and non-jsessionid path params surviving, flag-off byte-identity,
engine ≡ oracle where session echoes of one resource collapse to ONE
scheduled fetch, flag-off schedules them distinctly, composition with the
other alias rules, and the hash pin."""

from __future__ import annotations

import pytest

from fixtures.gen import TINY, fixture_bundle
from indigo_crawler_spark.config import CrawlConfig
from indigo_crawler_spark.kernels.canonicalize import (
    SESSION_PARAMS,
    canonicalize_url,
    strip_session_params,
    strip_session_path,
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
        ("PHPSESSID=abc&id=1", "id=1"),  # case-insensitive key
        ("id=1&sid=xyz&page=2", "id=1&page=2"),
        ("jsessionid=A1B2", ""),  # stripped empty → caller drops '?'
        ("ASPSESSIONIDQQRSTU=XYZ&a=1", "a=1"),  # pinned prefix rule
        ("aspsessionid=1", ""),  # bare prefix matches too
        ("sidebar=1&a=2", "sidebar=1&a=2"),  # 'sidebar' is not 'sid'
        ("session_id=9&sessionid=8&zenid=7", ""),
        ("sid%3D=1&a=2", "sid%3D=1&a=2"),  # no percent-decoding of keys
        ("", ""),
    ],
)
def test_strip_session_params_cases(query, want):
    assert strip_session_params(query) == want


@pytest.mark.parametrize(
    ("path", "want"),
    [
        ("/cart;jsessionid=ABC123", "/cart"),
        ("/cart;JSESSIONID=ABC123/view", "/cart/view"),  # mid-path segment
        ("/a;x=1;jsessionid=Z;y=2/b", "/a;x=1;y=2/b"),  # others survive
        ("/a;matrix=keep/b", "/a;matrix=keep/b"),  # non-session param kept
        ("/plain/path", "/plain/path"),
        (";jsessionid=Z", ""),  # whole path was the param → empty
        ("/a;jsessionid/b", "/a/b"),  # '='-less form still drops
    ],
)
def test_strip_session_path_cases(path, want):
    assert strip_session_path(path) == want


def test_session_params_set_pinned():
    # adding a key is a semantic change shipping as an engine release —
    # this tripwire makes an accidental edit fail loudly
    assert SESSION_PARAMS == frozenset(
        {
            "phpsessid",
            "jsessionid",
            "sessionid",
            "session_id",
            "sid",
            "zenid",
            "oscsid",
            "cfid",
            "cftoken",
        }
    )


def test_canonicalize_strip_session_and_fixed_point():
    ss = dict(strip_session=True)
    # both carrier positions in one url
    assert (
        canonicalize_url(
            "https://Example.org/cart;jsessionid=A1/view?PHPSESSID=x&id=1", **ss
        )
        == "https://example.org/cart/view?id=1"
    )
    # path stripped empty → '/'
    assert (
        canonicalize_url("https://example.org/;jsessionid=Z", **ss)
        == "https://example.org/"
    )
    # FIXED POINT
    for u in (
        "https://example.org/a;jsessionid=Q/b?sid=1&x=2",
        "http://h.example.org/?a=1",
    ):
        c1 = canonicalize_url(u, strip_session=True)
        assert canonicalize_url(c1, strip_session=True) == c1
    # composition with all three other rules: session → tracking → sort,
    # www collapse independent
    assert (
        canonicalize_url(
            "https://www.h.example.org/p;jsessionid=S?z=1&utm_source=t&PHPSESSID=v&a=2",
            True,
            True,
            True,
            True,
        )
        == "https://h.example.org/p?a=2&z=1"
    )


def test_flag_off_byte_identity():
    for u in (
        "https://example.org/cart;jsessionid=ABC/view?PHPSESSID=x&id=1",
        "https://example.org/a;matrix=1?sid=2",
    ):
        assert canonicalize_url(u) == canonicalize_url(
            u, False, False, False, False
        )
    # flag-off keeps both carriers byte-for-byte
    assert (
        canonicalize_url("https://example.org/c;jsessionid=A?sid=1")
        == "https://example.org/c;jsessionid=A?sid=1"
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


def _with_session_alias(fb):
    """Re-spell the first seed's resource with a jsessionid path param and
    a PHPSESSID query param, added as a second seed: under strip-session
    the pair is ONE frontier row; off, two. The page store gets a row for
    the session spelling so it is fetchable when distinct."""
    fb = {k: list(v) for k, v in fb.items()}
    base = canonicalize_url(fb["seeds"][0]["url"])
    assert base is not None and "?" not in base and ";" not in base
    scheme_host, _, path = base.partition("://")[2].partition("/")
    sess = (
        base.split("://")[0]
        + "://"
        + scheme_host
        + "/"
        + path
        + ";jsessionid=DEADBEEF?PHPSESSID=cafe"
    )
    fb["seeds"].append({"url": sess, "seed_rank": 99})
    page0 = next(
        (p for p in fb["pages"] if canonicalize_url(p["url"]) == base), None
    )
    if page0 is not None:
        fb["pages"].append(dict(page0, url=sess))
    else:
        fb["pages"].append(
            {
                "url": sess,
                "warc_ts": fb["pages"][0]["warc_ts"],
                "html": b"<html><body>s</body></html>",
                "text": None,
                "lang": "en",
            }
        )
    return fb, base, canonicalize_url(sess)


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


def test_strip_session_engine_vs_oracle(spark, tmp_path):
    fb0 = fixture_bundle(**TINY)
    fb, base, sess_canon = _with_session_alias(fb0)

    # flag ON: one canonical key — the session spelling merges into base
    cfg_on = CrawlConfig(
        round_limit=50,
        num_buckets=16,
        bloom_bucket_capacity=64,
        strip_session_enabled=True,
    )
    emitted_on = _run_both(spark, tmp_path / "on", cfg_on, fb)
    assert emitted_on.count(base) == 1
    assert sess_canon not in emitted_on
    assert all("jsessionid" not in u.lower() for u in emitted_on)

    # flag OFF (positive inertness): the two spellings schedule distinctly
    cfg_off = CrawlConfig(
        round_limit=50, num_buckets=16, bloom_bucket_capacity=64
    )
    emitted_off = _run_both(spark, tmp_path / "off", cfg_off, fb)
    assert base in emitted_off and sess_canon in emitted_off


def test_strip_session_hash_extension():
    base = CrawlConfig()
    assert "strip_session_enabled" not in base._hash_dict()
    on = CrawlConfig(strip_session_enabled=True)
    assert on.config_hash() != base.config_hash()
