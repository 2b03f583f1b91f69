"""Mirror-host detection — SEMANTICS.md §Mirror hosts.

Web-scale crawls waste budget on *mirrors*: the same site served under
several hosts (regional CDNs, vanity domains, scraped re-hosts). Every
mirrored page costs a fetch, a seen-set entry, and a politeness slot on
EACH host; detecting host pairs whose content overlaps heavily gives the
operator the deny-list input (exclude one spelling via `--exclude-pattern`
or cap it via `--max-pages-per-site`).

Detection is exact and content-addressed: two hosts are mirror candidates
when the overlap of their DISTINCT extracted-text sha sets, measured
against the SMALLER host (containment — a mirror plus extra pages still
reads as a mirror), reaches a pinned integer percentage. The integer
cross-multiplied comparison (``shared * 100 >= pct * least(docs)``) keeps
the gate float-free and DuckDB-re-derivable.

Scale shape: one distinct on (host, sha), one sha-keyed self-join for the
shared counts, one host-dimension join for the per-host totals — all
shuffle-hash, ids/hashes only, no text moves. The one quadratic hazard is
a sha shared by MANY hosts (boilerplate "domain parked" pages on
thousands of hosts would mint millions of pairs that say nothing about
mirroring); shas above ``max_hosts_per_sha`` are dropped from pair mining
(they still count in per-host totals, so ubiquitous boilerplate LOWERS
overlap rather than fabricating it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mirror_pairs(
    df: DataFrame,
    min_overlap_pct: int = 80,
    min_shared: int = 2,
    max_hosts_per_sha: int = 50,
) -> DataFrame:
    """(host, text_sha) rows → mirror-candidate host pairs.

    Returns (host_a, host_b, shared, docs_a, docs_b) with host_a <
    host_b (one deterministic spelling per pair), ``shared`` = distinct
    shas on both hosts, ``docs_*`` = each host's distinct-sha count, kept
    when ``shared >= min_shared`` AND ``shared * 100 >= min_overlap_pct *
    least(docs_a, docs_b)``. Input rows beyond the two named columns are
    ignored; duplicates collapse (the unit of evidence is a distinct
    (host, sha), not a row).
    """
    d = df.select("host", "text_sha").where(
        F.col("host").isNotNull() & F.col("text_sha").isNotNull()
    ).distinct()
    per_host = d.groupBy("host").agg(F.count(F.lit(1)).alias("docs"))
    # hot-sha guard: shas on too many hosts are boilerplate, not mirroring
    minable = d.join(
        d.groupBy("text_sha")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
        .where(
            (F.col("n_hosts") >= 2)
            & (F.col("n_hosts") <= int(max_hosts_per_sha))
        )
        .select("text_sha")
        .hint("SHUFFLE_HASH"),
        on="text_sha",
        how="inner",
    )
    a = minable.select("text_sha", F.col("host").alias("host_a"))
    b = minable.select("text_sha", F.col("host").alias("host_b"))
    shared = (
        a.join(b.hint("SHUFFLE_HASH"), on="text_sha")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            per_host.select(
                F.col("host").alias("host_a"), F.col("docs").alias("docs_a")
            ).hint("SHUFFLE_HASH"),
            on="host_a",
        )
        .join(
            per_host.select(
                F.col("host").alias("host_b"), F.col("docs").alias("docs_b")
            ).hint("SHUFFLE_HASH"),
            on="host_b",
        )
        .where(
            (F.col("shared") >= int(min_shared))
            & (
                F.col("shared") * 100
                >= F.lit(int(min_overlap_pct))
                * F.least(F.col("docs_a"), F.col("docs_b"))
            )
        )
        .select("host_a", "host_b", "shared", "docs_a", "docs_b")
    )
    return out
