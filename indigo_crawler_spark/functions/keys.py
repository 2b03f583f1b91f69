"""Key-derivation column expressions — SEMANTICS.md §Keys.

All pure JVM expressions (codegen, no Python): equality with the oracle's
``kernels/keys.py`` is verified in tests (xxh64 reimpl ⇔ F.xxhash64;
sha256-prefix ⇔ F.sha2+unhex; netloc slice on *canonical* URLs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def host_expr(canon_url: Column | str) -> Column:
    """netloc of a *canonical* URL (scheme://netloc/path...).

    Canonical form guarantees a path starting with '/', so the netloc is the
    third '/'-separated segment — a pure string slice, byte-equal to the
    oracle's ``urlsplit(u).netloc``. (``F.parse_url(..,'HOST')`` would drop
    port/userinfo, which SEMANTICS keeps in the host grouping key.)
    """
    c = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    return F.substring_index(F.substring_index(c, "/", 3), "://", -1)


def host_hash_expr(host: Column | str) -> Column:
    """xxhash64(host), Spark seed 42 — the partition-domain hash."""
    return F.xxhash64(host)


def pk_expr(host_hash: Column | str, num_buckets: int) -> Column:
    """pk = pmod(host_hash, P) — the one partition key (int)."""
    c = F.col(host_hash) if isinstance(host_hash, str) else host_hash
    return F.pmod(c, F.lit(num_buckets)).cast("int")


def url_hash_expr(canon_url: Column | str) -> Column:
    """sha256(canon_url)[:16] as binary — the seen-membership key."""
    c = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    return F.unhex(F.substring(F.sha2(c, 256), 1, 32))
