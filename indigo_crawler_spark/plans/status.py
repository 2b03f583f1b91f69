"""Crawl status — one zero-Spark-job summary of a state dir (SURVEY.md §2,
E40): what an operator asks a months-long crawl before anything else — how
far is it, what did it do, what is pending, what does it cost on disk — all
answerable from the commit records (manifest JSONs) plus a driver-side
directory walk. No Spark session touches data: at a 10^10-row frontier the
status call costs the same as at 10^4, because every number it reports was
already paid for at commit time (counters and digest row counts ride each
round's manifest; see plans/round.py `run_round`).
"""

from __future__ import annotations

import os

from indigo_crawler_spark.plans.round import CrawlState, last_complete_round
from indigo_crawler_spark.plans.state_gc import _dir_bytes

# counters summed across rounds for the lifetime view; anything else in a
# manifest's counters block is still visible via the last-round echo
_TOTALED = (
    "candidates", "emitted", "fetched_pages", "links_extracted", "links_new",
    "robots_denied", "trap_dropped", "budget_deferred", "domain_deferred",
    "cap_deferred", "banned", "backoff_skipped",
    # flag-gated counters: absent manifests contribute 0, so lifetime totals
    # are correct whether or not the knob was on for (part of) the crawl
    "thin_hosts_demoted", "nofollow_dropped", "canonical_variants",
    "refresh_redirects", "anchor_nofollow_dropped", "pattern_excluded",
    "recrawl_unchanged", "recrawl_changed", "host_capped", "ext_excluded",
    "host_excluded", "fetch_failed", "retry_exhausted", "failhost_backoff",
    "hreflang_alternates",
)


def crawl_status(state: CrawlState) -> dict:
    """Summarize ``state.io.root``: bootstrap facts, committed-round
    progress, lifetime counter totals, pending-frontier size, storage by
    table family, and GC lineage. Pure driver work — safe to run against a
    live crawl (reads only immutable committed manifests and dir sizes)."""
    io = state.io
    out: dict = {"root": io.root, "format": io.fmt}

    bm = io.read_manifest("bootstrap")
    if bm is not None:
        out["bootstrap"] = {
            k: bm[k]
            for k in (
                "distinct_urls_est", "n_heavy_hosts", "bloom_bucket_capacity",
                "quarantined_pages", "quarantined_seeds", "config_hash",
            )
            if k in bm
        }

    anchor = last_complete_round(state)
    out["rounds_committed"] = 0 if anchor is None else anchor + 1
    out["resume_anchor"] = anchor
    totals = {k: 0 for k in _TOTALED}
    seen_rows = 0
    last_counters: dict = {}
    frontier_pending = None
    for name in io.list_manifests():
        if not name.startswith("round_"):
            continue
        m = io.read_manifest(name) or {}
        c = m.get("counters") or {}
        for k in _TOTALED:
            totals[k] += int(c.get(k, 0))
        d = m.get("digests") or {}
        seen_rows += int((d.get("seen") or {}).get("rows", 0))
        if m.get("round") == anchor:
            last_counters = c
            frontier_pending = (d.get("frontier_next") or {}).get("rows")
    out["totals"] = totals
    out["urls_seen"] = seen_rows  # sum of committed seen deltas (pre-retire)
    out["frontier_pending"] = frontier_pending
    out["last_round_counters"] = last_counters

    # mid-crawl injections queued for the next round (operators/inject.py)
    # — same zero-Spark footer walk as the commit cross-check
    nxt = (anchor + 1) if anchor is not None else 0
    injected = io.file_row_count(f"injected/round={nxt}")
    if injected is not None:
        out["injected_pending"] = injected

    if io.fmt == "parquet" and os.path.isdir(io.root):
        by_family: dict[str, int] = {}
        for entry in sorted(os.listdir(io.root)):
            p = os.path.join(io.root, entry)
            if os.path.isdir(p):
                by_family[entry] = _dir_bytes(p)
        out["storage_bytes"] = sum(by_family.values())
        out["storage_by_family"] = by_family

    gcm = io.read_manifest("gc")
    if gcm is not None:
        out["gc"] = {
            "generation": gcm.get("generation"),
            "tables_reclaimed": len(gcm.get("reclaimed", [])),
        }
    return out
