"""Key derivation shared by engine and oracle — SEMANTICS.md §Keys."""

from __future__ import annotations

import hashlib

from indigo_crawler_spark.kernels.xxh64 import xxhash64


def url_hash(canon_url: str) -> bytes:
    """sha256(canon_url)[:16] — the `seen` membership key (16 bytes)."""
    return hashlib.sha256(canon_url.encode("utf-8")).digest()[:16]


def host_hash(host: str) -> int:
    """Spark-compatible xxhash64(host), seed 42, signed 64-bit."""
    return xxhash64(host)


def pk_of_host_hash(hh: int, p: int) -> int:
    """pmod(host_hash, P) — Spark's pmod semantics (non-negative result)."""
    return hh % p if hh >= 0 else (hh % p + p) % p
