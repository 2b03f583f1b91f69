"""Cuckoo filter kernel — the deletable seen-set variant (BASELINE.json:6).

numpy table of ``nbuckets × 4`` uint16 fingerprint slots (0 = empty).
Fingerprint and primary bucket derive from the element's 16-byte
``url_hash`` digest; the alternate bucket is ``b ^ mix(fp)`` with a
power-of-two bucket count, so ``alt(alt(b)) == b`` and lookups/deletes work
from either side without knowing which one an insert landed in. Eviction is
DETERMINISTIC (slot = attempt mod 4, bounded kicks) — no RNG anywhere
(SEMANTICS.md determinism rules).

Unlike the Bloom filter this structure supports *delete* (retire a URL so it
can be re-crawled). Like the Bloom, it is a transparent prefilter: no false
negatives for inserted-and-not-deleted elements, and the engine always
backstops positives with the exact seen table.

Capacity note: 4-slot buckets at 95% load ⇒ ~19 bits/element at the 16-bit
fingerprint size; fpr ≈ 2·4/2^16 ≈ 1.2e-4.
"""

from __future__ import annotations

import numpy as np

_MIX = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier (splitmix64)
_SLOTS = 4
_MAX_KICKS = 500


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


def num_buckets_for(capacity: int) -> int:
    return _next_pow2(max(1, int(capacity / (_SLOTS * 0.95)) + 1))


def _parts(digests: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprints uint16 ≥1, h1 uint64) from an (N,16) uint8 digest array."""
    d = digests.reshape(-1, 16)
    fp = d[:, 0:2].copy().view("<u2").reshape(-1).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    h1 = d[:, 2:10].copy().view("<u8").reshape(-1).astype(np.uint64)
    return fp, h1


def _alt(bucket: np.ndarray, fp: np.ndarray, mask: np.uint64) -> np.ndarray:
    # uint64 wraparound is the intended mixing; silence the per-batch
    # RuntimeWarning so real warnings stay visible in prod logs
    with np.errstate(over="ignore"):
        return (bucket ^ ((fp.astype(np.uint64) * _MIX) & mask)) & mask


class CuckooFilter:
    def __init__(self, nbuckets: int, table: np.ndarray | None = None):
        assert nbuckets & (nbuckets - 1) == 0, "nbuckets must be a power of two"
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = (
            table if table is not None else np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        )

    @classmethod
    def for_capacity(cls, capacity: int) -> "CuckooFilter":
        return cls(num_buckets_for(capacity))

    # -- core per-item ops (bounded loops; batch wrappers below) ----------
    def _insert_one(self, fp: int, b1: int) -> bool:
        b2 = int(_alt(np.uint64(b1), np.uint16(fp), self.mask))
        for b in (b1, b2):
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = fp
                return True
        b, cur = b1, np.uint16(fp)
        for attempt in range(_MAX_KICKS):
            slot = attempt % _SLOTS
            cur, self.table[b][slot] = self.table[b][slot], cur  # deterministic kick
            b = int(_alt(np.uint64(b), cur, self.mask))
            row = self.table[b]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = cur
                return True
        return False  # table effectively full

    def insert_many(self, digests: np.ndarray) -> np.ndarray:
        fp, h1 = _parts(digests)
        b1 = (h1 & self.mask).astype(np.int64)
        return np.fromiter(
            (self._insert_one(int(f), int(b)) for f, b in zip(fp, b1)),
            dtype=bool,
            count=len(fp),
        )

    def contains_many(self, digests: np.ndarray) -> np.ndarray:
        fp, h1 = _parts(digests)
        b1 = (h1 & self.mask).astype(np.int64)
        b2 = _alt(b1.astype(np.uint64), fp, self.mask).astype(np.int64)
        fpc = fp[:, None]
        return ((self.table[b1] == fpc) | (self.table[b2] == fpc)).any(axis=1)

    def delete_many(self, digests: np.ndarray) -> np.ndarray:
        """Remove one matching fingerprint per element; True if removed."""
        fp, h1 = _parts(digests)
        b1 = (h1 & self.mask).astype(np.int64)
        out = np.zeros(len(fp), dtype=bool)
        for i in range(len(fp)):
            f = fp[i]
            for b in (int(b1[i]), int(_alt(np.uint64(b1[i]), f, self.mask))):
                row = self.table[b]
                hit = np.flatnonzero(row == f)
                if hit.size:
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out

    # -- serde / merge ------------------------------------------------------
    def to_bytes(self) -> bytes:
        return self.table.astype("<u2").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, nbuckets: int) -> "CuckooFilter":
        table = np.frombuffer(blob, dtype="<u2").astype(np.uint16).reshape(nbuckets, _SLOTS)
        return cls(nbuckets, table.copy())

    def merge_from(self, other: "CuckooFilter") -> int:
        """Re-insert every occupied slot of *other* (same geometry).

        Slot position encodes nothing; (bucket, fp) is sufficient because
        alt() is an involution. Returns the number of failed inserts.
        """
        assert other.nbuckets == self.nbuckets
        fails = 0
        bs, ss = np.nonzero(other.table)
        for b, s in zip(bs, ss):
            if not self._insert_one(int(other.table[b, s]), int(b)):
                fails += 1
        return fails
