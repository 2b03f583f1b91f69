"""PII detection and redaction — the compliance pass a web-crawl training
pipeline runs before shipping text: count and mask emails, US-style SSNs and
phone numbers, and IPv4 addresses.

Everything here is pure codegen (`regexp_count` / chained `regexp_replace`)
— the text column crosses nothing, no Python in the plan — and every
pattern is written in the common subset of Java regex (Spark) and RE2
(DuckDB): no lookarounds, no backreferences, `\\b` word boundaries and
non-capturing groups only. The DuckDB mirrors below re-derive counts and
redacted text byte-for-byte (driver queries ``pii_counts`` /
``pii_redact``), which pins the dialect compatibility forever.

Redaction applies the patterns in the fixed ``PII_ORDER`` so overlapping
matches resolve identically everywhere (the patterns are pairwise
non-overlapping on well-formed inputs — a phone's 3-3-4 grouping can't
parse as an SSN's 3-2-4 and vice versa — but a pinned order makes the
degenerate cases deterministic too, e.g. an email whose local part looks
numeric is consumed by the email rule first).

Precision/recall here is the standard regex tradeoff (no checksum
validation, no international phone formats, IPv4 octets unbounded at the
regex level); the point is the SCALE SHAPE — one codegen'd projection over
100 TB — with the pattern set easy to extend. NULL text counts 0 / redacts
to NULL, matching SQL semantics on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pattern source of truth — shared verbatim by the Spark exprs and the
# DuckDB oracle strings (single-quoted SQL literals: no escape processing)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}
PII_ORDER = ("email", "ssn", "phone", "ipv4")
PII_TOKENS = {k: f"<{k.upper()}>" for k in PII_ORDER}


def pii_exprs(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (long) plus a total, all codegen."""
    c = F.col(text) if isinstance(text, str) else text
    counts = {
        f"n_{k}": F.regexp_count(c, F.lit(PII_PATTERNS[k])).cast("long")
        for k in PII_ORDER
    }
    total = None
    for v in counts.values():
        total = v if total is None else total + v
    counts["n_pii"] = total.cast("long")
    return counts


def redact_pii(text: Column | str) -> Column:
    """Replace every match with its ``<KIND>`` token, in PII_ORDER."""
    c = F.col(text) if isinstance(text, str) else text
    for k in PII_ORDER:
        c = F.regexp_replace(c, PII_PATTERNS[k], PII_TOKENS[k])
    return c


def pii_counts_oracle_sql(text_expr: str) -> str:
    """DuckDB SELECT-list fragment mirroring pii_exprs over *text_expr*."""
    parts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{PII_PATTERNS[k]}')) "
        f"AS BIGINT) AS n_{k}"
        for k in PII_ORDER
    ]
    total = " + ".join(
        f"len(regexp_extract_all({text_expr}, '{PII_PATTERNS[k]}'))"
        for k in PII_ORDER
    )
    parts.append(f"CAST({total} AS BIGINT) AS n_pii")
    return ", ".join(parts)


def redact_oracle_sql(text_expr: str) -> str:
    """DuckDB expression mirroring redact_pii over *text_expr*."""
    e = text_expr
    for k in PII_ORDER:
        e = f"regexp_replace({e}, '{PII_PATTERNS[k]}', '{PII_TOKENS[k]}', 'g')"
    return e
