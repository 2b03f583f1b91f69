"""Fixture generation rules — FIXTURES.md §A, seed 42, zero RNG.

Every value is a pure function of the row index through
``h(field, i) = first 8 bytes of sha256(f"42:{field}:{i}") as uint64``,
so fixtures are reproducible across machines/sessions without pickled state.
Heavy-host skew (Zipf s=1.2) is built in so salting (SURVEY.md J4/W2) is
always exercised.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from indigo_crawler_spark.kernels.keys import host_hash as _host_hash

SEED = 42

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor indigo juniper "
    "kelp lumen mesa nectar onyx prism quartz reef sierra tundra "
    "umber vortex willow xenon yonder zephyr copper dune ivory lotus "
    "marble nimbus"
).split()

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def h(field: str, *idx: int) -> int:
    """First 8 bytes of sha256("42:{field}:{i}[:{j}...]") as uint64."""
    key = ":".join([str(SEED), field, *map(str, idx)])
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big")


def _zipf_cdf(n_hosts: int, s: float = 1.2) -> list[float]:
    weights = [1.0 / (r ** s) for r in range(1, n_hosts + 1)]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)
    cdf[-1] = 1.0
    return cdf


class PagesSpec:
    """Row-wise generator for the `pages` table (FIXTURES.md §A1)."""

    def __init__(self, n_rows: int, n_hosts: int):
        self.n_rows = n_rows
        self.n_hosts = n_hosts
        self._cdf = _zipf_cdf(n_hosts)

    def zipf_rank(self, i: int) -> int:
        u = h("host", i) / 2.0 ** 64
        # binary search the CDF
        lo, hi = 0, self.n_hosts - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if self._cdf[mid] >= u:
                hi = mid
            else:
                lo = mid + 1
        return lo + 1  # ranks are 1-based → host name h{rank}

    def host(self, i: int) -> str:
        return f"h{self.zipf_rank(i)}.example.org"

    def path(self, i: int) -> str:
        return f"p/{h('path', i) % 10 ** 6}"

    def url(self, i: int) -> str:
        base = f"https://{self.host(i)}/{self.path(i)}"
        if i % 13 == 0:
            # denormalized variant exercising the canonicalizer
            host = self.host(i).upper()
            return f"HTTPS://{host}:443/./{self.path(i)}%7e#frag"
        return base

    def canon_url(self, i: int) -> str:
        """The canonical form both variants normalize to ('~' is unreserved)."""
        suffix = "~" if i % 13 == 0 else ""
        return f"https://{self.host(i)}/{self.path(i)}{suffix}"

    def n_links(self, i: int) -> int:
        return h("nl", i) % 12

    def child(self, i: int, j: int) -> int:
        return (i * 31 + j * 17) % self.n_rows

    def html(self, i: int) -> bytes:
        parts = [
            f"<html><head><title>T{i}</title><script>x</script></head>"
            f"<body><h1>H{i}</h1>"
        ]
        for j in range(self.n_links(i)):
            c = self.child(i, j)
            if i % 7 == 0:
                href = "/" + self.path(c)  # relative-href cohort
            else:
                href = self.url(c)
            parts.append(f'<a href="{href}">a{j}</a>')
        for j in range(2):
            words = " ".join(
                _WORDS[h("w", i, j * 8 + k) % len(_WORDS)] for k in range(8)
            )
            parts.append(f"<p>{words}</p>")
        parts.append("</body></html>")
        blob = "".join(parts).encode("utf-8")
        if i % 11 == 0:
            blob += b"\xff"  # invalid-UTF-8 cohort (errors='replace' path)
        return blob

    def warc_ts(self, i: int) -> datetime:
        return _EPOCH + timedelta(seconds=i)

    def lang(self, i: int) -> str:
        return ("en", "zh", "de", "es")[h("lang", i) % 4]

    def row(self, i: int) -> dict:
        return {
            "url": self.url(i),
            "warc_ts": self.warc_ts(i),
            "html": self.html(i),
            "text": None,  # filled by the engine's F7 kernel
            "lang": self.lang(i),
        }

    def rows(self):
        for i in range(self.n_rows):
            yield self.row(i)

    def rows_batch(self, ids) -> dict:
        """Batch generation, bit-identical to ``[self.row(i) for i in ids]``
        (pinned by tests/test_gen_batch.py) but ~3x cheaper per row: hash
        keys are built from pre-encoded byte prefixes instead of
        ``":".join`` + str maps, the zipf CDF walk is one vectorized
        ``np.searchsorted`` over the whole batch, and each needed
        host/path/url is computed exactly once even when several rows link
        to the same child. This is the hot inner loop of the synthetic
        corpus loader (sources/synthetic.py) — generation executes inside
        the engine's timed bootstrap pass, so its per-row Python cost is
        real pipeline cost (guide §4.2: vectorize inside the batch)."""
        import numpy as np

        sha = hashlib.sha256
        n = self.n_rows
        words_t = _WORDS
        nw = len(words_t)
        ids = [int(i) for i in ids]
        if not ids:
            return {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
        nls = {
            i: int.from_bytes(sha(b"42:nl:%d" % i).digest()[:8], "big") % 12
            for i in ids
        }
        url_idx = set(ids)
        path_only = set()
        children: dict[int, list[int]] = {}
        for i in ids:
            cs = [(i * 31 + j * 17) % n for j in range(nls[i])]
            children[i] = cs
            if i % 7 == 0:
                path_only.update(cs)
            else:
                url_idx.update(cs)
        host_idx = sorted(url_idx)
        us = np.fromiter(
            (
                int.from_bytes(sha(b"42:host:%d" % i).digest()[:8], "big")
                for i in host_idx
            ),
            dtype=np.uint64,
            count=len(host_idx),
        )
        if not hasattr(self, "_cdf_arr"):
            self._cdf_arr = np.asarray(self._cdf, dtype=np.float64)
        ranks = np.searchsorted(self._cdf_arr, us / 2.0**64, side="left") + 1
        hosts = {i: f"h{int(r)}.example.org" for i, r in zip(host_idx, ranks)}
        paths = {
            i: "p/%d"
            % (int.from_bytes(sha(b"42:path:%d" % i).digest()[:8], "big") % 10**6)
            for i in url_idx | path_only
        }
        urls = {}
        for i in url_idx:
            if i % 13 == 0:
                urls[i] = f"HTTPS://{hosts[i].upper()}:443/./{paths[i]}%7e#frag"
            else:
                urls[i] = f"https://{hosts[i]}/{paths[i]}"
        out_url, out_ts, out_html, out_lang = [], [], [], []
        for i in ids:
            parts = [
                f"<html><head><title>T{i}</title><script>x</script></head>"
                f"<body><h1>H{i}</h1>"
            ]
            rel = i % 7 == 0
            for j, c in enumerate(children[i]):
                href = "/" + paths[c] if rel else urls[c]
                parts.append(f'<a href="{href}">a{j}</a>')
            for j in range(2):
                base = j * 8
                ws = " ".join(
                    words_t[
                        int.from_bytes(
                            sha(b"42:w:%d:%d" % (i, base + k)).digest()[:8], "big"
                        )
                        % nw
                    ]
                    for k in range(8)
                )
                parts.append(f"<p>{ws}</p>")
            parts.append("</body></html>")
            blob = "".join(parts).encode("utf-8")
            if i % 11 == 0:
                blob += b"\xff"
            out_url.append(urls[i])
            out_ts.append(_EPOCH + timedelta(seconds=i))
            out_html.append(blob)
            out_lang.append(
                ("en", "zh", "de", "es")[
                    int.from_bytes(sha(b"42:lang:%d" % i).digest()[:8], "big") % 4
                ]
            )
        return {
            "url": out_url,
            "warc_ts": out_ts,
            "html": out_html,
            "text": [None] * len(ids),
            "lang": out_lang,
        }


def gen_pages(n_rows: int, n_hosts: int) -> list[dict]:
    return list(PagesSpec(n_rows, n_hosts).rows())


def gen_seeds(pages: list[dict], n_seeds: int) -> list[dict]:
    """First n_seeds distinct `pages.url` values by row index (FIXTURES §A2);
    every 10th given denormalized to prove seed canonicalization."""
    seen: set[str] = set()
    out: list[dict] = []
    for row in pages:
        u = row["url"]
        if u in seen:
            continue
        seen.add(u)
        rank = len(out)
        if rank % 10 == 3:
            u = u.replace("https://", "HTTPS://", 1) + "#seed"
        out.append({"url": u, "seed_rank": rank})
        if len(out) >= n_seeds:
            break
    return out


_ROBOTS_TEMPLATES = (
    "User-agent: *\nDisallow:",               # 0: allow all
    "User-agent: *\nDisallow: /",             # 1: deny all
    "User-agent: *\nDisallow: /p/1",          # 2: prefix deny
    "User-agent: indigo-spark\nDisallow: /p/3",  # 3: agent-specific
)


def gen_robots(n_hosts: int) -> list[dict]:
    out = []
    for rank in range(1, n_hosts + 1):
        host = f"h{rank}.example.org"
        out.append(
            {
                "host": host,
                "host_hash": _host_hash(host),
                "robots_txt": _ROBOTS_TEMPLATES[h("rb", rank) % 4],
                "fetched_ts": _EPOCH,
            }
        )
    return out


def gen_host_budgets(pages: list[dict], n_hosts: int) -> list[dict]:
    """Top 5% hosts by page count (FIXTURES §A4); ties broken by host name."""
    from collections import Counter

    counts: Counter[str] = Counter()
    for row in pages:
        u = row["url"].lower()
        host = u.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
        counts[host] += 1
    k = max(1, int(n_hosts * 0.05))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = []
    for rank, (host, _cnt) in enumerate(top):
        out.append(
            {
                "host": host,
                "host_hash": _host_hash(host),
                "budget": 2 + h("bud", rank) % 7,
                "backoff_until_round": 2 if rank % 9 == 8 else 0,
            }
        )
    return out


def fixture_bundle(n_rows: int, n_hosts: int, n_seeds: int) -> dict:
    """Everything a test / the oracle needs, in one dict."""
    pages = gen_pages(n_rows, n_hosts)
    return {
        "pages": pages,
        "seeds": gen_seeds(pages, n_seeds),
        "robots": gen_robots(n_hosts),
        "host_budgets": gen_host_budgets(pages, n_hosts),
    }


TINY = dict(n_rows=200, n_hosts=20, n_seeds=10)
T2 = dict(n_rows=10_000, n_hosts=300, n_seeds=100)
