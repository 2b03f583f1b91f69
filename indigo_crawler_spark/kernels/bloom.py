"""Partitioned-Bloom math — numpy bitmaps, SEMANTICS.md §Membership structures.

mmh3/bitarray are absent in this sandbox (SURVEY.md §0); the element key is
already a strong 16-byte digest (``url_hash = sha256(canon_url)[:16]``), so
k derived bit positions come from double hashing its two 64-bit halves —
no further hashing needed. All operations are vectorized numpy over uint64;
this module is shared by the Spark ``applyInPandas`` build/probe operators
(A4/A5) and the oracle's exactness cross-checks.

Scale note (10^10 URLs, design target BASELINE.json:6): at fpr=1e-3 a Bloom
needs ~14.4 bits/element → ~18 GB total, i.e. ~70 MB per pk bucket at P=256.
One bucket's bitmap therefore fits executor memory comfortably; beyond that,
shard a bucket's bitmap into `ceil(m/2^31)` binary rows (same pk, shard id)
and OR-probe per shard — the on-disk schema (`pk, nbits, k, bits`) already
permits multiple rows per pk.
"""

from __future__ import annotations

import math

import numpy as np


def bloom_params(n: int, fpr: float) -> tuple[int, int]:
    """(nbits, k) for expected *n* elements at false-positive rate *fpr*.

    nbits is rounded up to a multiple of 64 (whole uint64 words); k >= 1.
    """
    n = max(1, n)
    m = math.ceil(-n * math.log(fpr) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _halves(digests: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split an (N,16) uint8 array of digests into two LE uint64 vectors."""
    d = digests.reshape(-1, 16)
    h1 = d[:, 0:8].copy().view("<u8").reshape(-1)
    h2 = d[:, 8:16].copy().view("<u8").reshape(-1)
    return h1.astype(np.uint64), h2.astype(np.uint64)


def digests_to_array(digests: list[bytes]) -> np.ndarray:
    """List of 16-byte digests → (N,16) uint8 array."""
    if not digests:
        return np.empty((0, 16), dtype=np.uint8)
    return np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 16)


def bloom_build(digests: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """Build a bitmap (uint64 words, length nbits//64) from (N,16) digests."""
    words = np.zeros(nbits // 64, dtype=np.uint64)
    if digests.size == 0:
        return words
    h1, h2 = _halves(digests)
    m = np.uint64(nbits)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))
    return words


def bloom_probe(digests: np.ndarray, words: np.ndarray, nbits: int, k: int) -> np.ndarray:
    """Vectorized membership test → bool array. No false negatives."""
    n = digests.shape[0] if digests.ndim == 2 else len(digests) // 16
    if n == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _halves(digests)
    m = np.uint64(nbits)
    hit = np.ones(n, dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % m
        bits = (words[(idx >> np.uint64(6)).astype(np.int64)]
                >> (idx & np.uint64(63))) & np.uint64(1)
        hit &= bits.astype(bool)
    return hit


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """OR-merge two same-shape bitmaps (round delta into cumulative filter)."""
    return np.bitwise_or(a, b)


def words_to_bytes(words: np.ndarray) -> bytes:
    return words.astype("<u8").tobytes()


def bytes_to_words(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype="<u8").astype(np.uint64)
